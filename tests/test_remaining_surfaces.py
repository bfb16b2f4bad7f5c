"""Coverage for remaining user surfaces: LaSOT/NfS sequence loaders, tracker
reset/re-init, augmentation determinism, protobuf parser robustness."""

import os

import cv2
import numpy as np
import pytest


def _img(path, size=(40, 50)):
    cv2.imwrite(path, np.full((*size, 3), 90, np.uint8))


def test_lasot_layout(tmp_path):
    from feartracker_tpu.data.sequence import LaSOTDataset

    seq = tmp_path / "cat" / "cat-1"
    (seq / "img").mkdir(parents=True)
    for i in range(3):
        _img(str(seq / "img" / f"{i+1:08d}.jpg"))
    (seq / "groundtruth.txt").write_text("1,2,10,12\n2,3,10,12\n3,4,10,12")
    ds = LaSOTDataset(str(tmp_path))
    assert len(ds) == 1
    files, anno, name = ds[0]
    assert name == "lasot" and len(files) == 3
    np.testing.assert_array_equal(anno[1], [2, 3, 10, 12])


def test_otb_layout(tmp_path):
    from feartracker_tpu.data.sequence import DATASET_REGISTRY, OTBDataset

    seq = tmp_path / "Basketball"
    (seq / "img").mkdir(parents=True)
    for i in range(4):
        _img(str(seq / "img" / f"{i+1:04d}.jpg"))
    (seq / "groundtruth_rect.txt").write_text("198,214,34,81\n197,214,34,81\n195,214,34,81\n194,214,34,81")
    # David-style: more frames than annotation rows → trailing frames kept
    seq2 = tmp_path / "David"
    (seq2 / "img").mkdir(parents=True)
    for i in range(5):
        _img(str(seq2 / "img" / f"{i+1:04d}.jpg"))
    (seq2 / "groundtruth_rect.txt").write_text("10\t20\t30\t40\n11\t20\t30\t40")
    # Jogging-style: only numbered variants → one sequence per target
    seq3 = tmp_path / "Jogging"
    (seq3 / "img").mkdir(parents=True)
    for i in range(3):
        _img(str(seq3 / "img" / f"{i+1:04d}.jpg"))
    (seq3 / "groundtruth_rect.1.txt").write_text("1,2,10,10\n2,2,10,10\n3,2,10,10")
    (seq3 / "groundtruth_rect.2.txt").write_text("5,6,12,12\n6,6,12,12\n7,6,12,12")
    # Freeman3-style: surplus frames annotated from the START → leading frames
    seq4 = tmp_path / "Freeman3"
    (seq4 / "img").mkdir(parents=True)
    for i in range(5):
        _img(str(seq4 / "img" / f"{i+1:04d}.jpg"))
    (seq4 / "groundtruth_rect.txt").write_text("1,1,8,8\n2,1,8,8\n3,1,8,8")
    ds = OTBDataset(str(tmp_path))
    assert len(ds) == 5 and DATASET_REGISTRY["otb"] is OTBDataset
    names = {ds.sequence_name(i): i for i in range(len(ds))}
    assert {"Jogging.1", "Jogging.2"} <= set(names)
    np.testing.assert_array_equal(ds[names["Jogging.2"]][1][0], [5, 6, 12, 12])
    files, anno, name = ds[names["Basketball"]]
    assert name == "otb" and len(files) == 4
    np.testing.assert_array_equal(anno[0], [198, 214, 34, 81])
    files2, anno2, _ = ds[names["David"]]
    assert len(files2) == 2 and files2[0].endswith("0004.jpg")
    np.testing.assert_array_equal(anno2[1], [11, 20, 30, 40])
    # Non-David surplus frames align to the LEADING annotation rows
    files3, anno3, _ = ds[names["Freeman3"]]
    assert len(files3) == 3 and files3[0].endswith("0001.jpg") and files3[-1].endswith("0003.jpg")
    np.testing.assert_array_equal(anno3[0], [1, 1, 8, 8])


def test_trackingnet_layout(tmp_path):
    from feartracker_tpu.data.sequence import TrackingNetDataset

    for chunk, seqs in [("TRAIN_0", ["a", "b"]), ("TEST", ["t"])]:
        for seq in seqs:
            frames = tmp_path / chunk / "frames" / seq
            frames.mkdir(parents=True)
            # bare-integer frame names where numeric and lexical order differ
            for i in [0, 1, 2, 10]:
                _img(str(frames / f"{i}.jpg"))
            anno = tmp_path / chunk / "anno"
            anno.mkdir(exist_ok=True)
            (anno / f"{seq}.txt").write_text("1,2,10,12\n2,3,10,12\n3,4,10,12\n4,5,10,12")
    with pytest.raises(ValueError):  # GOT-10k-ish subset must fail loudly
        TrackingNetDataset(str(tmp_path), subset="val")
    train = TrackingNetDataset(str(tmp_path), subset="train")
    test = TrackingNetDataset(str(tmp_path), subset="test")
    assert len(train) == 2 and len(test) == 1
    files, anno, name = train[0]
    assert name == "trackingnet" and len(files) == 4
    # numeric frame order: 10.jpg sorts last, not after 1.jpg
    assert [os.path.basename(f) for f in files] == ["0.jpg", "1.jpg", "2.jpg", "10.jpg"]
    np.testing.assert_array_equal(anno[1], [2, 3, 10, 12])


def test_nfs_layout(tmp_path):
    from feartracker_tpu.data.sequence import NfSDataset

    seq = tmp_path / "ball"
    img_dir = seq / "30" / "ball"
    img_dir.mkdir(parents=True)
    for i in range(2):
        _img(str(img_dir / f"{i+1:05d}.jpg"))
    # NfS rows: frame x1 y1 x2 y2 ...
    (seq / "30" / "ball.txt").write_text("1 5 6 15 26 0\n2 6 7 16 27 0")
    ds = NfSDataset(str(tmp_path))
    assert len(ds) == 1
    files, anno, name = ds[0]
    assert name == "nfs"
    np.testing.assert_array_equal(anno[0], [5, 6, 10, 20])  # xyxy→xywh


def test_tracker_reset_and_reinit():
    import jax
    import jax.numpy as jnp

    from feartracker_tpu.models.fbnet import TINY_TRUNK
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.tracker import FEARTracker

    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0), (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))), train=False
    )
    cfg = TrackerConfig(score_size=8, total_stride=8, instance_size=64, template_size=32)
    tracker = FEARTracker(model, variables, cfg)
    frame = np.random.RandomState(0).randint(0, 255, (96, 128, 3), np.uint8)
    tracker.initialize(frame, np.array([40, 30, 30, 40]))
    tracker.update(frame)
    tracker.reset()  # iOS-style failure reset (ref: VOTracker.swift:98-103)
    with pytest.raises(AssertionError):
        tracker.update(frame)
    tracker.initialize(frame, np.array([10, 10, 20, 20]))  # re-init works
    out = tracker.update(frame)
    assert "bbox" in out and "confidence" in out


def test_paired_augs_deterministic_and_shared():
    from feartracker_tpu.data.augmentations import RGBShift, PairedCompose, tracking_augmentations

    rng1 = np.random.RandomState(7)
    rng2 = np.random.RandomState(7)
    a = np.full((16, 16, 3), 100, np.uint8)
    b = np.full((16, 16, 3), 150, np.uint8)
    pipe = tracking_augmentations()
    o1 = pipe(a, b, rng1)
    o2 = pipe(a, b, rng2)
    for x, y in zip(o1, o2):
        np.testing.assert_array_equal(x, y)  # seeded determinism

    # shared params: the same shift applied to both images
    shift = RGBShift(p=1.0)
    pc = PairedCompose([shift])
    oa, ob = pc(a, b, np.random.RandomState(1))
    np.testing.assert_array_equal(oa.astype(int) - 100, ob.astype(int) - 150)


def test_protowire_truncated_buffer():
    from feartracker_tpu.convert import protowire as pw

    # length-delimited field promising more bytes than exist
    buf = bytes([0x0A, 0xFF, 0x01]) + b"xy"
    fields = pw.parse(buf)  # truncated payload is sliced short, not crash
    assert fields[0].number == 1
    # invalid wire type raises cleanly
    with pytest.raises(ValueError):
        pw.parse(bytes([0x0B]))  # wire type 3 (group) unsupported


def test_parse_mlmodel_rejects_non_nn(tmp_path):
    from feartracker_tpu.convert.coreml import parse_mlmodel

    # a valid protobuf with no field-500 submessage
    p = tmp_path / "x.mlmodel"
    p.write_bytes(bytes([0x08, 0x04]))  # field 1 varint 4
    with pytest.raises(ValueError, match="no neuralNetwork"):
        parse_mlmodel(str(p))
