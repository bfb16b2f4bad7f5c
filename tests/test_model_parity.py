"""End-to-end weight parity: Flax FEARNet with CoreML-recovered weights vs an
independent torch interpreter of the CoreML graph itself."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.convert.coreml import parse_mlmodel
from feartracker_tpu.convert.fear_weights import imagenet_preprocess, load_fear_xs
from feartracker_tpu.models.fear_net import FEARNet
from tests.mlmodel_executor import run_graph

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"
INIT_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/TrackerInit.mlmodel"

needs_mlmodel = pytest.mark.skipif(
    not os.path.exists(TRACKER_ML), reason="reference mlmodel not mounted"
)


@pytest.fixture(scope="module")
def fear_setup():
    model = FEARNet()
    variables = load_fear_xs(TRACKER_ML)
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    return model, variables


def _rand_image(rng, size):
    return rng.randint(0, 255, (size, size, 3)).astype(np.uint8)


@needs_mlmodel
def test_template_features_match_coreml_graph(fear_setup):
    model, variables = fear_setup
    rng = np.random.RandomState(42)
    img = _rand_image(rng, 128)
    norm = imagenet_preprocess(img)

    # oracle: run the TrackerInit graph (expects the raw CoreML preprocessing:
    # bias then scale layer; skip those two stages by feeding normalized input
    # directly past scale_layer)
    graph = parse_mlmodel(INIT_ML)["layers"]
    body = [l for l in graph if l.name != "scale_layer"]
    ref = run_graph(body, {"image_scaled": norm.transpose(2, 0, 1)[None]})["features"]

    ours = model.apply(variables, jnp.asarray(norm[None]), method=model.get_features)
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    assert ours_nchw.shape == ref.shape == (1, 256, 8, 8)
    np.testing.assert_allclose(ours_nchw, ref, atol=2e-3, rtol=1e-3)


@needs_mlmodel
def test_track_outputs_match_coreml_graph(fear_setup):
    model, variables = fear_setup
    rng = np.random.RandomState(7)
    search = imagenet_preprocess(_rand_image(rng, 256))
    feats = rng.randn(1, 256, 8, 8).astype(np.float32)

    graph = parse_mlmodel(TRACKER_ML)["layers"]
    body = [l for l in graph if l.name != "scale_layer"]
    ref = run_graph(
        body,
        {"image_scaled": search.transpose(2, 0, 1)[None], "template_features": feats},
    )

    feats_nhwc = jnp.asarray(feats.transpose(0, 2, 3, 1))
    out = model.apply(variables, jnp.asarray(search[None]), feats_nhwc, method=model.track)
    bbox = np.asarray(out["TARGET_REGRESSION_LABEL_KEY"]).transpose(0, 3, 1, 2)
    cls = np.asarray(out["TARGET_CLASSIFICATION_KEY"]).transpose(0, 3, 1, 2)
    assert bbox.shape == ref["bbox"].shape == (1, 4, 16, 16)
    assert cls.shape == ref["cls"].shape == (1, 1, 16, 16)
    np.testing.assert_allclose(cls, ref["cls"], atol=5e-3, rtol=1e-2)
    # bbox map passed through exp; compare in log space for scale-free tolerance
    np.testing.assert_allclose(np.log(bbox), np.log(ref["bbox"]), atol=5e-3, rtol=1e-2)


NOEMBS_ML = (
    "/root/reference/evaluate/MeasurePerformance/MeasurePerformance/models/"
    "FEAR-XS-NoEmbs.mlmodel"
)


@pytest.mark.skipif(not os.path.exists(NOEMBS_ML), reason="reference mlmodel not mounted")
def test_noembs_checkpoint_matches_its_coreml_graph():
    """The second zoo checkpoint (weights/fear_xs_noembs.npz source): the
    recovered weights reproduce the NoEmbs export's own track graph — the
    same parity standard as the default checkpoint."""
    model = FEARNet()
    variables = load_fear_xs(NOEMBS_ML)
    rng = np.random.RandomState(11)
    search = imagenet_preprocess(_rand_image(rng, 256))
    feats = rng.randn(1, 256, 8, 8).astype(np.float32)

    body = [l for l in parse_mlmodel(NOEMBS_ML)["layers"] if l.name != "scale_layer"]
    ref = run_graph(
        body,
        {"image_scaled": search.transpose(2, 0, 1)[None], "template_features": feats},
    )
    out = model.apply(
        variables, jnp.asarray(search[None]),
        jnp.asarray(feats.transpose(0, 2, 3, 1)), method=model.track,
    )
    bbox = np.asarray(out["TARGET_REGRESSION_LABEL_KEY"]).transpose(0, 3, 1, 2)
    cls = np.asarray(out["TARGET_CLASSIFICATION_KEY"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(cls, ref["cls"], atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.log(bbox), np.log(ref["bbox"]), atol=5e-3, rtol=1e-2)

    # and the packaged archive is exactly these weights
    from feartracker_tpu.convert.load import PACKAGED_FEAR_XS, load_npz_variables

    packaged = load_npz_variables(PACKAGED_FEAR_XS.replace("fear_xs.npz", "fear_xs_noembs.npz"))
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["neck"]["downsample"]["conv"]["kernel"]),
        np.asarray(packaged["params"]["neck"]["downsample"]["conv"]["kernel"]),
    )


@needs_mlmodel
def test_scale_layer_matches_imagenet_normalize():
    """The CoreML preprocessing (bias + fp16 scale) equals ImageNet
    normalization to fp16 precision — documents the equivalence."""
    m = parse_mlmodel(TRACKER_ML)
    pre = m["preprocessing"]["image"]
    scale_layer = next(l for l in m["layers"] if l.name == "scale_layer")
    scales = np.asarray(scale_layer.attrs["scale"], np.float32)
    mean = np.array([0.485, 0.456, 0.406]) * 255
    std = np.array([0.229, 0.224, 0.225]) * 255
    np.testing.assert_allclose(
        [pre["red_bias"], pre["green_bias"], pre["blue_bias"]], -mean, rtol=1e-5
    )
    np.testing.assert_allclose(scales, 1.0 / std, rtol=2e-3)  # fp16 quantized
