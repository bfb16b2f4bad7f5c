"""Generate training CSV annotations from standard dataset layouts.

The reference requires users to hand-build per-dataset CSVs with the schema
sequence_id, track_id, frame_index, img_path, bbox, frame_shape, dataset,
presence, near_corner (ref: README.md:82-93) but ships no tooling. This
tool builds that CSV from standard dataset layouts: GOT-10k, LaSOT,
TrackingNet, COCO-2017 instances (single-frame tracks), ImageNet-VID, and
YouTube-BoundingBoxes (converting the upstream yt_bb detection CSVs + frame
dumps) — every training dataset of the reference's full_train recipe
(ref: config/dataset/full_train.yaml).

    python tools/make_annotations.py got10k --root /data/got10k --subset train \
        --out /data/got10k/train.csv
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feartracker_tpu.data.sequence import _read_gt  # noqa: E402


def _near_corner(bbox, shape_wh, margin: int = 2) -> int:
    x, y, w, h = bbox
    W, H = shape_wh
    return int(x <= margin or y <= margin or x + w >= W - margin or y + h >= H - margin)


def _frame_shape(img_path: str):
    import cv2

    img = cv2.imread(img_path)
    return (img.shape[1], img.shape[0]) if img is not None else (0, 0)


def rows_for_sequence(seq_id, track_id, files, anno, dataset, root, absence=None):
    if not files:
        return []
    shape_wh = _frame_shape(files[0])
    out = []
    n = min(len(files), len(anno))
    for i in range(n):
        bbox = [int(round(v)) for v in anno[i][:4]]
        presence = 1
        if absence is not None and i < len(absence):
            presence = int(absence[i] == 0)
        if bbox[2] <= 0 or bbox[3] <= 0:
            presence = 0
        out.append(
            dict(
                sequence_id=seq_id,
                track_id=track_id,
                frame_index=i,
                img_path=os.path.relpath(files[i], root),
                bbox=str(bbox),
                frame_shape=str(list(shape_wh)),
                dataset=dataset,
                presence=presence,
                near_corner=_near_corner(bbox, shape_wh),
            )
        )
    return out


def make_got10k(root: str, subset: str) -> pd.DataFrame:
    base = os.path.join(root, subset)
    list_file = os.path.join(base, "list.txt")
    seqs = (
        [l.strip() for l in open(list_file) if l.strip()]
        if os.path.exists(list_file)
        else sorted(os.path.basename(d) for d in glob.glob(os.path.join(base, "*")) if os.path.isdir(d))
    )
    rows = []
    for seq in seqs:
        seq_dir = os.path.join(base, seq)
        gt = os.path.join(seq_dir, "groundtruth.txt")
        if not os.path.exists(gt):
            continue
        files = sorted(glob.glob(os.path.join(seq_dir, "*.jpg")))
        absence_file = os.path.join(seq_dir, "absence.label")
        absence = None
        if os.path.exists(absence_file):
            absence = np.loadtxt(absence_file, dtype=int)  # 1 = absent
        rows += rows_for_sequence(seq, seq, files, _read_gt(gt), "got10k", root, absence)
    return pd.DataFrame(rows)


def make_lasot(root: str, subset: str = "") -> pd.DataFrame:
    rows = []
    for gt in sorted(glob.glob(os.path.join(root, "*", "*", "groundtruth.txt"))):
        seq_dir = os.path.dirname(gt)
        seq = os.path.basename(seq_dir)
        files = sorted(glob.glob(os.path.join(seq_dir, "img", "*.jpg")))
        absence = None
        occ = os.path.join(seq_dir, "full_occlusion.txt")
        oov = os.path.join(seq_dir, "out_of_view.txt")
        if os.path.exists(occ) and os.path.exists(oov):
            a = _read_gt(occ).ravel().astype(int)
            b = _read_gt(oov).ravel().astype(int)
            absence = np.clip(a + b, 0, 1)  # 1 = occluded or out of view
        rows += rows_for_sequence(seq, seq, files, _read_gt(gt), "lasot", root, absence)
    return pd.DataFrame(rows)


def make_trackingnet(root: str, subset: str = "train") -> pd.DataFrame:
    """TrackingNet train chunks: root/TRAIN_*/frames/<seq>/<N>.jpg (numeric
    order) + anno/<seq>.txt. No absence labels in the release."""
    rows = []
    chunks = sorted(
        d for d in glob.glob(os.path.join(root, "TRAIN_*")) if os.path.isdir(d)
    )
    for chunk in chunks:
        for anno_path in sorted(glob.glob(os.path.join(chunk, "anno", "*.txt"))):
            seq = os.path.splitext(os.path.basename(anno_path))[0]
            frame_dir = os.path.join(chunk, "frames", seq)
            files = glob.glob(os.path.join(frame_dir, "*.jpg"))
            files.sort(key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
            rows += rows_for_sequence(
                seq, seq, files, _read_gt(anno_path), "trackingnet", root
            )
    return pd.DataFrame(rows)


def make_coco(root: str, subset: str = "train") -> pd.DataFrame:
    """COCO instances → one single-frame track per (non-crowd) object, the
    reference's static-image training recipe (full_train.yaml composes
    coco2017 through the same TrackSampler: template == search frame,
    BBoxCropWithOffsets provides the geometry variation). Frame shapes come
    from the JSON — no image reads."""
    import json

    anno_path = os.path.join(root, "annotations", f"instances_{subset}2017.json")
    with open(anno_path) as fh:
        coco = json.load(fh)
    images = {im["id"]: im for im in coco["images"]}
    rows = []
    for a in coco["annotations"]:
        if a.get("iscrowd"):
            continue
        bbox = [int(round(v)) for v in a["bbox"]]
        if bbox[2] <= 0 or bbox[3] <= 0:
            continue
        im = images[a["image_id"]]
        shape_wh = (im["width"], im["height"])
        rows.append(
            dict(
                sequence_id=f"img{a['image_id']}",
                track_id=f"ann{a['id']}",
                frame_index=0,
                img_path=os.path.join(f"{subset}2017", im["file_name"]),
                bbox=str(bbox),
                frame_shape=str(list(shape_wh)),
                dataset="coco2017",
                presence=1,
                near_corner=_near_corner(bbox, shape_wh),
            )
        )
    return pd.DataFrame(rows)


def make_ilsvrc_vid(root: str, subset: str = "train") -> pd.DataFrame:
    """ImageNet-VID: Annotations/VID/<subset>/**/<seq>/NNNNNN.xml, one XML per
    frame with zero or more <object><trackid> entries. Each (sequence,
    trackid) becomes a track; frames where the object is absent are skipped
    (the CSV's frame_index is the real video frame number, so frame_offset
    windows stay time-correct); occluded frames get presence=0."""
    import xml.etree.ElementTree as ET

    anno_root = os.path.join(root, "Annotations", "VID", subset)
    rows = []
    seq_dirs = sorted(
        d for d, dirs, files in os.walk(anno_root) if files and not dirs
    )
    for seq_dir in seq_dirs:
        seq = os.path.relpath(seq_dir, anno_root).replace(os.sep, "/")
        for xml_path in sorted(glob.glob(os.path.join(seq_dir, "*.xml"))):
            frame_idx = int(os.path.splitext(os.path.basename(xml_path))[0])
            xml = ET.parse(xml_path).getroot()
            W = int(xml.findtext("size/width"))
            H = int(xml.findtext("size/height"))
            img_rel = os.path.join(
                "Data", "VID", subset, seq,
                os.path.splitext(os.path.basename(xml_path))[0] + ".JPEG",
            )
            for obj in xml.findall("object"):
                tid = obj.findtext("trackid")
                x1 = int(obj.findtext("bndbox/xmin"))
                y1 = int(obj.findtext("bndbox/ymin"))
                bbox = [
                    x1, y1,
                    int(obj.findtext("bndbox/xmax")) - x1,
                    int(obj.findtext("bndbox/ymax")) - y1,
                ]
                if bbox[2] <= 0 or bbox[3] <= 0:
                    continue
                rows.append(
                    dict(
                        sequence_id=seq,
                        track_id=f"{seq}/t{tid}",
                        frame_index=frame_idx,
                        img_path=img_rel,
                        bbox=str(bbox),
                        frame_shape=str([W, H]),
                        dataset="ilsvrc",
                        presence=int(obj.findtext("occluded", "0") == "0"),
                        near_corner=_near_corner(bbox, (W, H)),
                    )
                )
    return pd.DataFrame(rows)


# frame-dump layouts produced by the common yt_bb download scripts; each is a
# format string over the annotation row's fields, relative to --root
YTBB_PATH_TEMPLATES = [
    "{youtube_id}/{youtube_id}_{timestamp_ms}.jpg",
    "{class_name}/{youtube_id}+{class_id}+{object_id}/{youtube_id}_{timestamp_ms}.jpg",
    "{youtube_id}_{timestamp_ms}_{class_id}_{object_id}.jpg",
]


def make_youtube_bb(root: str, subset: str = "train", path_template: str = "") -> pd.DataFrame:
    """YouTube-BoundingBoxes: converts the upstream yt_bb detection CSV
    (yt_bb_detection_{subset}.csv: youtube_id, timestamp_ms, class_id,
    class_name, object_id, object_presence, xmin, xmax, ymin, ymax with
    normalized [0, 1] corner coordinates) into the repo schema.

    The upstream release ships annotations only; frames come from the user's
    own download/decode run under ``root``. Rows whose frame image is missing
    are dropped (yt_bb downloads are routinely partial — videos go private),
    and the drop count is reported. Frame pixel dimensions are read once per
    video and used to denormalize the corner coords to integer xywh.
    ``path_template`` overrides the auto-detected frame layout (any format
    string over youtube_id/timestamp_ms/class_id/class_name/object_id)."""
    anno_path = os.path.join(root, f"yt_bb_detection_{subset}.csv")
    if not os.path.exists(anno_path):
        candidates = glob.glob(os.path.join(root, "yt_bb_*.csv"))
        if not candidates:
            raise FileNotFoundError(f"no yt_bb_*.csv found under {root}")
        anno_path = candidates[0]
    cols = [
        "youtube_id", "timestamp_ms", "class_id", "class_name",
        "object_id", "object_presence", "xmin", "xmax", "ymin", "ymax",
    ]
    data = pd.read_csv(anno_path, header=None, names=cols)

    templates = [path_template] if path_template else YTBB_PATH_TEMPLATES
    shape_cache: dict = {}
    rows = []
    missing = 0
    for (vid, cls_id, obj_id), group in data.groupby(
        ["youtube_id", "class_id", "object_id"], sort=True
    ):
        group = group.sort_values("timestamp_ms")
        track = f"{vid}/{cls_id}_{obj_id}"
        tmpl = None
        for row in group.itertuples():
            fields = dict(
                youtube_id=vid, timestamp_ms=int(row.timestamp_ms),
                class_id=int(cls_id), class_name=str(row.class_name),
                object_id=int(obj_id),
            )
            if tmpl is None:  # resolve the layout on the track's first hit
                for cand in templates:
                    if os.path.exists(os.path.join(root, cand.format(**fields))):
                        tmpl = cand
                        break
            rel = tmpl.format(**fields) if tmpl else None
            if rel is None or not os.path.exists(os.path.join(root, rel)):
                missing += 1
                continue
            if vid not in shape_cache:
                shape_cache[vid] = _frame_shape(os.path.join(root, rel))
            W, H = shape_cache[vid]
            present = str(row.object_presence).strip().lower() in ("present", "1", "true")
            x = int(round(float(row.xmin) * W))
            y = int(round(float(row.ymin) * H))
            w = int(round((float(row.xmax) - float(row.xmin)) * W))
            h = int(round((float(row.ymax) - float(row.ymin)) * H))
            if w <= 0 or h <= 0:
                present = False
                x = y = w = h = 0
            rows.append(
                dict(
                    sequence_id=str(vid),
                    track_id=track,
                    # yt_bb samples one frame per second at whole-second
                    # timestamps; seconds are the natural frame_index so
                    # frame_offset windows stay time-correct across gaps
                    frame_index=int(row.timestamp_ms) // 1000,
                    img_path=rel,
                    bbox=str([x, y, w, h]),
                    frame_shape=str([W, H]),
                    dataset="youtube_bb",
                    presence=int(present),
                    near_corner=_near_corner([x, y, w, h], (W, H)) if present else 0,
                )
            )
    if missing:
        print(f"[youtube_bb] dropped {missing} rows with no decoded frame on disk")
    return pd.DataFrame(rows)


BUILDERS = {
    "got10k": make_got10k,
    "lasot": make_lasot,
    "trackingnet": make_trackingnet,
    "coco": make_coco,
    "ilsvrc": make_ilsvrc_vid,
    "youtube_bb": make_youtube_bb,
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=sorted(BUILDERS))
    p.add_argument("--root", required=True)
    p.add_argument("--subset", default="train")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--path_template",
        default="",
        help="youtube_bb only: frame-path format string over "
        "youtube_id/timestamp_ms/class_id/class_name/object_id",
    )
    args = p.parse_args()
    kwargs = {"path_template": args.path_template} if args.dataset == "youtube_bb" else {}
    df = BUILDERS[args.dataset](args.root, args.subset, **kwargs)
    df.to_csv(args.out, index=False)
    print(f"wrote {len(df)} rows ({df['track_id'].nunique()} tracks) to {args.out}")


if __name__ == "__main__":
    main()
