"""Sampler parity against the REFERENCE's own sampler code.

Executes /root/reference/model_training/dataset/track_sampling.py verbatim
via importlib (never copied) on the same synthetic CSV and compares the
deterministic parts of the sampling distribution with the repo's samplers:
eligible-template enumeration, epoch length semantics, per-index template
rows, in-range search candidate sets, and the negative-drop count formula.
(The random draws themselves use different RNG streams by design — the repo
threads seeded per-item RNGs for loader determinism, the reference uses
global numpy/pandas randomness — so parity is asserted on the distribution's
support, not on individual draws.)
"""

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

REF_SAMPLING = "/root/reference/model_training/dataset/track_sampling.py"

needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_SAMPLING), reason="reference not mounted"
)


def _load_reference_sampling():
    spec = importlib.util.spec_from_file_location("ref_track_sampling", REF_SAMPLING)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    rng = np.random.RandomState(3)
    rows = []
    for t in range(3):
        for f in range(12):
            rows.append(
                dict(
                    sequence_id=f"s{t}", track_id=f"t{t}", frame_index=f,
                    img_path=f"t{t}_f{f}.jpg", bbox="[5, 6, 20, 18]",
                    frame_shape="[100, 80]", dataset="syn",
                    presence=0 if (t, f) in ((0, 4), (1, 2), (2, 9)) else 1,
                    near_corner=1 if (t, f) == (0, 7) else 0,
                )
            )
    p = tmp_path_factory.mktemp("parity") / "train.csv"
    pd.DataFrame(rows).to_csv(p, index=False)
    return str(p)


@needs_reference
def test_frame_sampler_enumeration_matches_reference(csv_path):
    """With no negatives dropped (negative_ratio=1.0), the eligible-template
    index list, epoch length, per-index template rows and in-range search
    candidate sets must match the reference's FrameSampler exactly."""
    ref_mod = _load_reference_sampling()

    from feartracker_tpu.data.samplers import FrameSampler

    ref = ref_mod.FrameSampler(csv_path, negative_ratio=1.0, frame_offset=4,
                               num_samples=None, clip_range=True)
    ref.parse_samples()
    ours = FrameSampler(csv_path, negative_ratio=1.0, frame_offset=4,
                        num_samples=None, clip_range=True, seed=0)
    ours.parse_samples()

    assert list(ours.indices) == list(ref.indices)
    assert len(ours) == len(ref)
    for idx in range(len(ref)):
        r_t = ref.data.iloc[ref.indices[idx]]
        o_t = ours.data.loc[ours.indices[idx]]
        assert (r_t["track_id"], r_t["frame_index"]) == (o_t["track_id"], o_t["frame_index"])
        # in-range candidate set for the search draw
        r_cand = ref.data.iloc[ref.mapping[r_t["track_id"]]]
        r_cand = r_cand[
            (r_cand["frame_index"] > r_t["frame_index"] - 4)
            & (r_cand["frame_index"] < r_t["frame_index"] + 4)
        ]
        o_cand = ours.data.loc[ours.mapping[o_t["track_id"]]]
        o_cand = o_cand[
            (o_cand["frame_index"] > o_t["frame_index"] - 4)
            & (o_cand["frame_index"] < o_t["frame_index"] + 4)
        ]
        assert sorted(zip(r_cand["track_id"], r_cand["frame_index"])) == sorted(
            zip(o_cand["track_id"], o_cand["frame_index"])
        )


@needs_reference
def test_frame_sampler_negative_drop_count_matches_reference(csv_path):
    """The drop-count FORMULA matches (int((neg_ratio - target) * len)); the
    reference draws the rows to drop WITH replacement (duplicate draws
    under-drop nondeterministically), the repo draws without replacement so
    the count is exact — assert ours equals the formula and bounds the
    reference's."""
    ref_mod = _load_reference_sampling()

    from feartracker_tpu.data.samplers import FrameSampler

    df = pd.read_csv(csv_path)
    n, negs = len(df), int((df["presence"] == 0).sum())
    target = 0.02
    expect_drop = max(0, int((negs / n - target) * n))

    ours = FrameSampler(csv_path, negative_ratio=target, frame_offset=4,
                        num_samples=None, seed=0)
    ours.parse_samples()
    assert len(ours.data) == n - expect_drop

    np.random.seed(0)
    ref = ref_mod.FrameSampler(csv_path, negative_ratio=target, frame_offset=4,
                               num_samples=None, clip_range=False)
    ref.parse_samples()
    # with-replacement draw drops at most expect_drop distinct rows
    assert n - expect_drop <= len(ref.data) <= n


@needs_reference
def test_track_sampler_template_pool_matches_reference(csv_path):
    """TrackSampler: the template pool (presence & !near_corner) and the
    track mapping match the reference's on undropped data."""
    ref_mod = _load_reference_sampling()

    from feartracker_tpu.data.samplers import TrackSampler

    np.random.seed(1)
    ref = ref_mod.TrackSampler(csv_path, negative_ratio=1.0, frame_offset=4,
                               num_samples=10, clip_range=True)
    ref.parse_samples()
    ours = TrackSampler(csv_path, negative_ratio=1.0, frame_offset=4,
                        num_samples=10, clip_range=True, seed=1)
    ours.parse_samples()

    r_pool = sorted(zip(ref.template_data["track_id"], ref.template_data["frame_index"]))
    o_pool = sorted(zip(ours.template_data["track_id"], ours.template_data["frame_index"]))
    assert r_pool == o_pool
    assert set(ref.mapping) == set(ours.mapping)
    for k in ref.mapping:
        assert sorted(ref.mapping[k]) == sorted(ours.mapping[k])
    assert len(ref) == len(ours) == 10
