"""Annotation CSV generator: GOT-10k layout → training-schema CSV that the
samplers accept end-to-end."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest


@pytest.fixture()
def got10k_tree(tmp_path):
    base = tmp_path / "train"
    names = []
    for s in range(2):
        seq = f"GOT-10k_Train_{s:06d}"
        d = base / seq
        d.mkdir(parents=True)
        gt = []
        for f in range(4):
            img = np.full((80, 100, 3), 50, np.uint8)
            x, y = 10 + 5 * f, 8 + 2 * f
            cv2.rectangle(img, (x, y), (x + 30, y + 25), (200, 100, 50), -1)
            cv2.imwrite(str(d / f"{f:08d}.jpg"), img)
            gt.append(f"{x},{y},30,25")
        (d / "groundtruth.txt").write_text("\n".join(gt))
        (d / "absence.label").write_text("0\n0\n1\n0")
        names.append(seq)
    (base / "list.txt").write_text("\n".join(names))
    return tmp_path


def test_make_trackingnet_csv(tmp_path):
    chunk = tmp_path / "TRAIN_0"
    for seq in ("a", "b"):
        frames = chunk / "frames" / seq
        frames.mkdir(parents=True)
        for i in [0, 1, 2, 10]:  # numeric vs lexical order differs
            cv2.imwrite(str(frames / f"{i}.jpg"), np.full((60, 80, 3), 70, np.uint8))
        anno = chunk / "anno"
        anno.mkdir(exist_ok=True)
        (anno / f"{seq}.txt").write_text("5,6,20,18\n6,7,20,18\n7,8,20,18\n8,9,20,18")
    out_csv = str(tmp_path / "tn.csv")
    r = subprocess.run(
        [sys.executable, "tools/make_annotations.py", "trackingnet",
         "--root", str(tmp_path), "--out", out_csv],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert len(df) == 8 and df["dataset"].unique().tolist() == ["trackingnet"]
    # numeric frame ordering: frame_index 3 maps to 10.jpg
    last = df[(df["sequence_id"] == "a") & (df["frame_index"] == 3)]["img_path"].item()
    assert last.endswith("10.jpg")


def test_make_got10k_csv(got10k_tree, tmp_path):
    out_csv = str(tmp_path / "train.csv")
    r = subprocess.run(
        [sys.executable, "tools/make_annotations.py", "got10k", "--root", str(got10k_tree),
         "--subset", "train", "--out", out_csv],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert len(df) == 8
    assert set(df.columns) >= {
        "sequence_id", "track_id", "frame_index", "img_path", "bbox",
        "frame_shape", "dataset", "presence", "near_corner",
    }
    # absence.label frame 2 marked absent
    assert df[df["frame_index"] == 2]["presence"].tolist() == [0, 0]
    # CSV feeds the sampler directly
    from feartracker_tpu.data.samplers import TrackSampler

    s = TrackSampler(out_csv, negative_ratio=1.0, frame_offset=4, num_samples=4, clip_range=True, seed=0)
    s.parse_samples()
    pair = s.extract_sample(0)
    assert pair["template"]["presence"] == 1


def _run_builder(name, root, out_csv):
    r = subprocess.run(
        [sys.executable, "tools/make_annotations.py", name, "--root", str(root), "--out", out_csv],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    import pandas as pd

    return pd.read_csv(out_csv)


def test_make_coco_csv(tmp_path):
    import json

    (tmp_path / "annotations").mkdir()
    coco = {
        "images": [
            {"id": 7, "file_name": "000007.jpg", "width": 100, "height": 80},
            {"id": 9, "file_name": "000009.jpg", "width": 64, "height": 64},
        ],
        "annotations": [
            {"id": 1, "image_id": 7, "bbox": [10, 12, 30, 25], "iscrowd": 0},
            {"id": 2, "image_id": 7, "bbox": [50, 5, 20, 20], "iscrowd": 0},
            {"id": 3, "image_id": 9, "bbox": [0, 0, 10, 10], "iscrowd": 1},  # crowd: dropped
            {"id": 4, "image_id": 9, "bbox": [5, 5, 0, 7], "iscrowd": 0},    # degenerate: dropped
        ],
    }
    (tmp_path / "annotations" / "instances_train2017.json").write_text(json.dumps(coco))
    df = _run_builder("coco", tmp_path, str(tmp_path / "coco.csv"))
    assert len(df) == 2  # crowd + degenerate dropped
    assert df["dataset"].unique().tolist() == ["coco2017"]
    assert (df["frame_index"] == 0).all() and (df["presence"] == 1).all()
    assert df["track_id"].nunique() == 2  # one single-frame track per object
    assert df.iloc[0]["img_path"] == os.path.join("train2017", "000007.jpg")


def test_make_youtube_bb_csv(tmp_path):
    """yt_bb upstream schema (normalized corner coords, ms timestamps,
    present/absent strings) → repo schema with denormalized int xywh."""
    rows = [
        # youtube_id, timestamp_ms, class_id, class_name, object_id, presence, xmin, xmax, ymin, ymax
        ("vidA", 0, 5, "dog", 0, "present", 0.10, 0.40, 0.25, 0.75),
        ("vidA", 1000, 5, "dog", 0, "present", 0.12, 0.42, 0.25, 0.75),
        ("vidA", 2000, 5, "dog", 0, "absent", -1.0, -1.0, -1.0, -1.0),
        ("vidA", 3000, 5, "dog", 0, "present", 0.00, 0.30, 0.00, 0.50),  # near corner
        ("vidA", 5000, 5, "dog", 0, "present", 0.20, 0.50, 0.25, 0.75),  # ts gap
        ("vidA", 0, 5, "dog", 1, "present", 0.50, 0.90, 0.10, 0.60),  # 2nd object
        ("vidB", 0, 3, "cat", 0, "present", 0.25, 0.75, 0.25, 0.75),  # frame missing on disk
    ]
    with open(tmp_path / "yt_bb_detection_train.csv", "w") as fh:
        for r in rows:
            fh.write(",".join(str(v) for v in r) + "\n")
    frames = tmp_path / "vidA"
    frames.mkdir()
    for ts in (0, 1000, 2000, 3000, 5000):
        cv2.imwrite(str(frames / f"vidA_{ts}.jpg"), np.full((100, 200, 3), 80, np.uint8))

    df = _run_builder("youtube_bb", tmp_path, str(tmp_path / "ytbb.csv"))
    assert len(df) == 6  # vidB dropped (no decoded frame)
    assert df["dataset"].unique().tolist() == ["youtube_bb"]
    assert sorted(df["track_id"].unique()) == ["vidA/5_0", "vidA/5_1"]
    t0 = df[df["track_id"] == "vidA/5_0"].sort_values("frame_index")
    # ms timestamps -> 1 fps frame_index, gap preserved
    assert t0["frame_index"].tolist() == [0, 1, 2, 3, 5]
    # denormalized [0.10..0.40]x[0.25..0.75] on a 200x100 frame
    assert t0.iloc[0]["bbox"] == "[20, 25, 60, 50]"
    assert t0.iloc[0]["frame_shape"] == "[200, 100]"
    assert t0["presence"].tolist() == [1, 1, 0, 1, 1]
    assert t0.iloc[2]["bbox"] == "[0, 0, 0, 0]"  # absent row zeroed
    assert t0["near_corner"].tolist() == [0, 0, 0, 1, 0]
    # the emitted CSV feeds the sampler directly
    from feartracker_tpu.data.samplers import TrackSampler

    out_csv = str(tmp_path / "ytbb.csv")
    s = TrackSampler(out_csv, negative_ratio=1.0, frame_offset=3, num_samples=4, clip_range=True, seed=0)
    s.parse_samples()
    assert s.extract_sample(0)["template"]["presence"] == 1


def test_make_ilsvrc_vid_csv(tmp_path):
    seq = "ILSVRC2015_train_00001000"
    anno_dir = tmp_path / "Annotations" / "VID" / "train" / "a" / seq
    anno_dir.mkdir(parents=True)

    def xml(frame, objs):
        body = "".join(
            f"<object><trackid>{t}</trackid><occluded>{occ}</occluded>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x1+w}</xmax><ymax>{y1+h}</ymax></bndbox></object>"
            for t, occ, x1, y1, w, h in objs
        )
        (anno_dir / f"{frame:06d}.xml").write_text(
            f"<annotation><size><width>120</width><height>90</height></size>{body}</annotation>"
        )

    xml(0, [(0, 0, 10, 10, 30, 20), (1, 0, 50, 40, 20, 20)])
    xml(1, [(0, 1, 12, 11, 30, 20)])  # track 1 absent, track 0 occluded
    xml(2, [(0, 0, 14, 12, 30, 20), (1, 0, 55, 42, 20, 20)])

    df = _run_builder("ilsvrc", tmp_path, str(tmp_path / "vid.csv"))
    assert len(df) == 5
    t0 = df[df["track_id"].str.endswith("/t0")]
    t1 = df[df["track_id"].str.endswith("/t1")]
    assert t0["frame_index"].tolist() == [0, 1, 2]
    assert t1["frame_index"].tolist() == [0, 2]  # real frame numbers, gap kept
    assert t0["presence"].tolist() == [1, 0, 1]  # occluded frame 1
    assert df.iloc[0]["img_path"].endswith(os.path.join(seq, "000000.JPEG"))
    assert df.iloc[0]["frame_shape"] == "[120, 90]"
