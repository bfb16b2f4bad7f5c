"""Evaluation harness tests: FPS protocols, FLOPs counting, GOT-10k AO/SR."""

import os

import numpy as np
import pytest

from feartracker_tpu.evaluate import fps as F
from feartracker_tpu.evaluate.got10k_eval import summarize


def test_fps_benchmark_counts_and_csv(tmp_path):
    calls = {"n": 0}

    def call():
        calls["n"] += 1
        return calls["n"]

    csv_path = str(tmp_path / "tele.csv")
    res = F.fps_benchmark(call, sync=lambda x: None, warmup=3, timed=10, csv_path=csv_path)
    assert calls["n"] == 13
    assert res["fps"] > 0 and res["mean_ms"] >= 0
    assert os.path.exists(csv_path)
    lines = open(csv_path).readlines()
    assert len(lines) == 11  # header + 10 rows
    # host + device memory telemetry columns (Swift harness analog)
    header = lines[0].strip().split(",")
    assert {"rss_mb", "device_mem_mb", "device_peak_mb"} <= set(header)


def test_online_benchmark_drop_accounting():
    import time

    def slow_call():
        time.sleep(0.025)
        return 0

    res = F.online_benchmark(slow_call, sync=lambda x: None, duration_s=0.5, input_fps=100)
    # 25ms call vs 10ms period → ~2 drops per call
    assert res["dropped"] > 0
    assert 0 < res["drop_rate"] < 1


def test_pipelined_online_hides_fetch_latency():
    """With the 'device' time hidden behind async dispatch, the pipelined
    protocol sustains a cadence the serial protocol drops: dispatch is
    instant, fetch blocks 25ms — serial pays 25ms/tick, pipelined (depth 2)
    overlaps the wait with the next tick's work."""
    import time

    class Handle:
        def __init__(self):
            self.ready_at = time.time() + 0.025

        def wait(self):
            dt = self.ready_at - time.time()
            if dt > 0:
                time.sleep(dt)

    res = F.pipelined_online_benchmark(
        dispatch=Handle, fetch=lambda h: h.wait(), duration_s=0.5, input_fps=30, depth=2
    )
    assert res["completed"] >= 5  # ~15 ticks at 30 FPS in 0.5s
    assert res["latency_p50_ms"] >= 25.0  # latency includes the device time

    serial = F.online_benchmark(
        lambda: time.sleep(0.035), sync=lambda x: None, duration_s=0.5, input_fps=30
    )
    assert serial["drop_rate"] > 0  # the serial protocol drops at this cadence
    # the substantive claim is comparative (robust to 1-core CI contention):
    # pipelining hides the 25ms fetch that serial pays per tick
    assert res["drop_rate"] < max(serial["drop_rate"], 0.34)

    with pytest.raises(ValueError):
        F.pipelined_online_benchmark(Handle, fetch=lambda h: None, duration_s=0.1, depth=0)


def test_offline_benchmark_runs_exact_calls():
    calls = {"n": 0}

    def call():
        calls["n"] += 1

    res = F.offline_benchmark(call, sync=lambda x: None, duration_s=0.1, fps=50)
    assert calls["n"] == 5
    assert res["achieved_fps"] > 0


def test_summarize_ao_sr():
    seqs = [np.array([1.0, 0.8, 0.6]), np.array([0.4, 0.2])]
    res = summarize(seqs, ["a", "b"])
    assert res["ao"] == pytest.approx((0.8 + 0.3) / 2)
    # seq a: all 3 frames > 0.5; seq b: none
    assert res["sr50"] == pytest.approx((1.0 + 0.0) / 2)
    assert res["sr75"] == pytest.approx((2 / 3 + 0.0) / 2)
    assert res["num_sequences"] == 2


def test_flops_counting_tiny_model():
    import jax

    from feartracker_tpu.evaluate.flops import count_params, track_cost
    from feartracker_tpu.models.fbnet import TINY_TRUNK
    from feartracker_tpu.models.fear_net import FEARNet

    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (np.zeros((1, 32, 32, 3), np.float32), np.zeros((1, 64, 64, 3), np.float32)),
        train=False,
    )
    cost = track_cost(model, variables, search_size=64, feat_size=4, channels=16)
    assert cost["flops"] > 0
    assert cost["params"] == count_params(variables["params"])
    assert cost["macs"] == cost["flops"] / 2


def test_ope_metrics():
    from feartracker_tpu.evaluate.got10k_eval import ope_metrics

    gt = [np.array([[10.0, 10, 20, 20], [30, 30, 20, 20]])]
    # perfect predictions
    res = ope_metrics(gt, gt)
    assert res["precision_20px"] == 1.0
    assert res["success_auc"] == pytest.approx(np.mean(np.arange(0, 1.05, 0.05) < 1.0), abs=0.05)
    # far predictions
    far = [np.array([[200.0, 200, 20, 20], [250, 250, 20, 20]])]
    res2 = ope_metrics(far, gt)
    assert res2["precision_20px"] == 0.0
    assert res2["success_auc"] < 0.1


def test_got10k_submission_writer(tmp_path):
    from feartracker_tpu.evaluate.got10k_eval import write_got10k_submission

    class DummyDataset:
        def __init__(self, root):
            import cv2

            self.files = []
            for i in range(3):
                p = str(tmp_path / f"f{i}.jpg")
                cv2.imwrite(p, np.full((40, 50, 3), 100, np.uint8))
                self.files.append(p)

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return self.files, np.array([[5.0, 5, 10, 10]]), "dummy"

        def sequence_name(self, i):
            return "seq_a"

    class DummyTracker:
        def initialize(self, img, box):
            self.box = list(box)

        def update(self, img):
            self.box = [self.box[0] + 1, self.box[1], self.box[2], self.box[3]]
            return {"bbox": self.box}

    out = write_got10k_submission(DummyTracker(), DummyDataset(tmp_path), str(tmp_path / "sub"))
    lines = open(os.path.join(out, "seq_a", "seq_a_001.txt")).read().strip().split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("5.0000,5.0000")
    assert lines[1].startswith("6.0000,5.0000")
    times = open(os.path.join(out, "seq_a", "seq_a_time.txt")).read().strip().split("\n")
    assert len(times) == 3

    # TrackingNet server format: flat <seq>.txt, same boxes, no time files
    from feartracker_tpu.evaluate.got10k_eval import write_trackingnet_submission

    out2 = write_trackingnet_submission(
        DummyTracker(), DummyDataset(tmp_path), str(tmp_path / "sub_tn")
    )
    tn_lines = open(os.path.join(out2, "seq_a.txt")).read().strip().split("\n")
    assert tn_lines == lines


def test_success_plot_writer(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    from feartracker_tpu.evaluate.plots import SERIES_COLORS, plot_success

    t = np.arange(0, 1.05, 0.05)
    one = str(tmp_path / "one.png")
    plot_success({"fear_xs": np.clip(1 - t, 0, 1)}, one)
    many = str(tmp_path / "many.png")
    plot_success({f"t{i}": np.clip(1 - t * (1 + i / 10), 0, 1) for i in range(8)}, many)
    assert os.path.getsize(one) > 1000 and os.path.getsize(many) > 1000

    with pytest.raises(ValueError):
        plot_success({f"t{i}": t for i in range(9)}, str(tmp_path / "no.png"))
    assert len(set(SERIES_COLORS)) == 8  # fixed categorical order, never cycled


def test_summarize_includes_success_curve():
    from feartracker_tpu.evaluate.got10k_eval import SUCCESS_THRESHOLDS, summarize

    res = summarize([np.array([0.9, 0.6, 0.3])], ["s"])
    assert len(res["success_curve"]) == len(SUCCESS_THRESHOLDS)
    assert res["success_curve"][0] == 1.0  # all overlaps > 0
    assert res["success_auc"] == pytest.approx(np.mean(res["success_curve"]))
    assert "precision_curve" not in res  # only present when errors are supplied


def test_precision_stats_and_summarize():
    from feartracker_tpu.evaluate.got10k_eval import (
        NORM_PRECISION_THRESHOLDS,
        PRECISION_THRESHOLDS,
        precision_stats,
        summarize,
    )

    gt = np.array([[10.0, 10, 40, 40], [30, 30, 40, 40]])
    # centers shifted by (3,4) → 5px error; normalized error 5/40 = 0.125
    pred = gt + np.array([3.0, 4, 0, 0])
    ps = precision_stats(pred, gt)
    assert len(ps["precision_curve"]) == len(PRECISION_THRESHOLDS)
    assert ps["precision_curve"][4] == 0.0 and ps["precision_curve"][5] == 1.0
    assert len(ps["norm_precision_curve"]) == len(NORM_PRECISION_THRESHOLDS)
    # 0.125 normalized error: threshold 0.12 fails, 0.13 passes
    assert ps["norm_precision_curve"][12] == 0.0
    assert ps["norm_precision_curve"][13] == 1.0

    ov = np.array([0.9, 0.9])
    res = summarize([ov], ["s"], [ps])
    assert res["precision_20px"] == 1.0
    assert res["precision_curve"] == ps["precision_curve"].tolist()
    assert res["norm_precision_auc"] == pytest.approx(ps["norm_precision_curve"].mean())


def test_ope_metrics_emits_precision_curves():
    from feartracker_tpu.evaluate.got10k_eval import (
        NORM_PRECISION_THRESHOLDS,
        PRECISION_THRESHOLDS,
        ope_metrics,
    )

    gt = [np.array([[10.0, 10, 20, 20], [30, 30, 20, 20]])]
    res = ope_metrics(gt, gt)
    assert len(res["precision_curve"]) == len(PRECISION_THRESHOLDS)
    assert res["precision_curve"][0] == 1.0  # zero error at threshold 0
    assert len(res["norm_precision_curve"]) == len(NORM_PRECISION_THRESHOLDS)
    assert res["norm_precision_auc"] == 1.0


def test_multi_tracker_report(tmp_path):
    pytest.importorskip("matplotlib")
    import json

    from feartracker_tpu.evaluate.got10k_eval import precision_stats, summarize
    from feartracker_tpu.evaluate.report import write_report

    rng = np.random.RandomState(0)
    results = {}
    for name, spread in (("fear_xs", 2.0), ("tuned", 1.0)):
        gt = np.abs(rng.randn(12, 4)) * 30 + np.array([20, 20, 30, 30])
        pred = gt + rng.randn(12, 4) * spread
        from feartracker_tpu.core.geometry import overlap_xywh_np

        results[name] = summarize(
            [overlap_xywh_np(pred, gt)], ["seq"], [precision_stats(pred, gt)]
        )
    paths = write_report(results, str(tmp_path / "rep"))
    perf = json.load(open(paths["performance"]))
    assert set(perf) == {"fear_xs", "tuned"}
    assert perf["tuned"]["overall"]["success_auc"] >= perf["fear_xs"]["overall"]["success_auc"]
    assert os.path.getsize(paths["success_plot"]) > 1000
    assert os.path.getsize(paths["precision_plot"]) > 1000


def test_precision_plot_writer(tmp_path):
    pytest.importorskip("matplotlib")
    from feartracker_tpu.evaluate.got10k_eval import PRECISION_THRESHOLDS
    from feartracker_tpu.evaluate.plots import plot_precision

    t = np.asarray(PRECISION_THRESHOLDS, float)
    curve = np.clip(t / 30.0, 0, 1)
    one = str(tmp_path / "prec_one.png")
    plot_precision({"fear_xs": curve}, one)
    many = str(tmp_path / "prec_many.png")
    plot_precision({f"t{i}": np.clip(t / (25 + i), 0, 1) for i in range(3)}, many)
    assert os.path.getsize(one) > 1000 and os.path.getsize(many) > 1000


def test_report_cli_main(tmp_path):
    pytest.importorskip("matplotlib")
    import json
    import sys

    from feartracker_tpu.evaluate import report as R

    res = {"ao": 0.5, "success_auc": 0.5, "success_curve": [1.0] * 21,
           "precision_curve": [1.0] * 51, "precision_20px": 1.0, "num_sequences": 1}
    p1, p2 = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    json.dump(res, open(p1, "w"))
    json.dump(dict(res, success_auc=0.6), open(p2, "w"))
    out = str(tmp_path / "rep")
    old = sys.argv
    try:
        sys.argv = ["report", out, f"a={p1}", f"b={p2}"]
        R.main()
    finally:
        sys.argv = old
    perf = json.load(open(os.path.join(out, R.PERFORMANCE_JSON)))
    assert set(perf) == {"a", "b"}
    assert os.path.exists(os.path.join(out, R.SUCCESS_PNG))

    with pytest.raises(SystemExit):
        sys.argv = ["report", out, "missing-equals-sign"]
        try:
            R.main()
        finally:
            sys.argv = old


def test_report_folds_beyond_eight_trackers(tmp_path):
    pytest.importorskip("matplotlib")
    from feartracker_tpu.evaluate.report import write_report

    t = np.arange(0, 1.05, 0.05)
    results = {
        f"t{i}": {"ao": i / 10, "success_auc": i / 10,
                  "success_curve": list(np.clip(1 - t * (1 + i / 10), 0, 1))}
        for i in range(10)
    }
    paths = write_report(results, str(tmp_path / "rep10"))  # must not raise
    assert os.path.getsize(paths["success_plot"]) > 1000
    import json

    assert len(json.load(open(paths["performance"]))) == 10  # all in the JSON


def test_synthetic_appearance_drift_generator(tmp_path):
    from tools.make_synthetic_dataset import generate

    csv_path = generate(str(tmp_path), tracks=1, frames=4, val_sequences=1,
                        seed=3, appearance_drift=1.0)
    assert os.path.exists(csv_path)
    import cv2

    val = sorted((tmp_path / "got10k" / "val").glob("GOT-10k_Val_*"))
    frames = sorted(val[0].glob("*.jpg"))
    assert len(frames) == 4
    gt = open(val[0] / "groundtruth.txt").read().strip().split("\n")
    assert len(gt) == 4
    first, last = cv2.imread(str(frames[0])), cv2.imread(str(frames[-1]))
    b0 = [int(float(v)) for v in gt[0].split(",")]
    b3 = [int(float(v)) for v in gt[-1].split(",")]
    c0 = first[b0[1] + b0[3] // 2, b0[0] + b0[2] // 2].astype(int)
    c3 = last[b3[1] + b3[3] // 2, b3[0] + b3[2] // 2].astype(int)
    assert np.abs(c0 - c3).sum() > 60  # the object color actually drifted


def test_synthetic_structural_scenarios(tmp_path):
    """The structural-appearance-change regimes (VERDICT r2 #3): occlusion
    bars actually cover the target at the crossing frame; pose morph rotates
    the shape (bbox aspect changes); every scenario yields valid bboxes."""
    import cv2
    import pandas as pd

    from tools.make_synthetic_dataset import generate

    n = 13
    boxes = {}
    for sc in ("occlusion", "pose", "swap"):
        root = tmp_path / sc
        csv_path = generate(str(root), tracks=1, frames=n, val_sequences=0,
                            seed=5, scenario=sc)
        df = pd.read_csv(csv_path)
        assert len(df) == n
        b = np.stack(df["bbox"].apply(eval))
        assert (b[:, 2] > 0).all() and (b[:, 3] > 0).all()
        boxes[sc] = (df, b)

    # occlusion: at the crossing frame (n//3) the bar covers the object
    # center; compare that pixel against the same pixel one frame earlier
    df, b = boxes["occlusion"]
    f_cross = n // 3
    img_c = cv2.imread(str(tmp_path / "occlusion" / df.iloc[f_cross]["img_path"]))
    bb = b[f_cross]
    center = img_c[bb[1] + bb[3] // 2, bb[0] + bb[2] // 2].astype(int)
    img_p = cv2.imread(str(tmp_path / "occlusion" / df.iloc[0]["img_path"]))
    bb0 = b[0]
    center0 = img_p[bb0[1] + bb0[3] // 2, bb0[0] + bb0[2] // 2].astype(int)
    assert np.abs(center - center0).sum() > 60  # occluder color, not object

    # pose: the apparent aspect ratio changes substantially over the track
    _, b = boxes["pose"]
    aspect = b[:, 2] / b[:, 3]
    assert aspect.max() / aspect.min() > 1.3


def test_endurance_telemetry_drift_columns_and_flatness(tmp_path):
    """Endurance protocols must report step-time drift + HBM high-watermark
    trend (VERDICT r4 #8) and the CSV must carry the trend columns. A
    steady-state workload (fixed-cost call, no allocation growth) must
    measure as flat: |step drift| small, HBM trend == high-watermark-stable.
    The drift bound is generous (2×) because this asserts LEAK-flatness,
    not scheduler jitter, and CI hosts are noisy."""
    csv_path = str(tmp_path / "soak.csv")

    def call():
        # fixed-cost host work, no growing state
        return float(np.square(np.arange(512)).sum())

    res = F.offline_benchmark(
        call, sync=lambda x: None, duration_s=0.5, fps=400,
        csv_path=csv_path, mem_every=16,
    )
    for key in ("step_time_drift_pct", "rss_drift_mb",
                "hbm_high_watermark_mb", "hbm_trend_mb"):
        assert key in res, f"missing endurance summary key {key}"
    # flatness: last-decile step time within 2x of the first decile, and the
    # sampled HBM peak did not grow (CPU backend reports zeros, which also
    # satisfies stability; on device this is the real watermark assert)
    assert abs(res["step_time_drift_pct"]) < 100.0, res
    assert res["hbm_trend_mb"] <= 1.0, res

    header = open(csv_path).readline().strip().split(",")
    assert {"duration_ms", "rss_mb", "device_mem_mb", "device_peak_mb"} <= set(header)


def test_telemetry_summary_detects_drift():
    """The drift statistic itself: a synthetic ramp in duration must show as
    positive drift; a flat series as ~0."""
    tele = F.Telemetry()
    for i in range(100):
        tele.record(i, 0.001 * (1 + i / 50))  # 1 ms -> 3 ms ramp
    s = tele.summary()
    assert s["step_time_drift_pct"] > 100.0

    flat = F.Telemetry()
    for i in range(100):
        flat.record(i, 0.002)
    assert abs(flat.summary()["step_time_drift_pct"]) < 1e-9
