"""Deployment export roundtrip: serialize both graphs, reload without model
source, compare against the live model."""

import jax
import jax.numpy as jnp
import numpy as np

from feartracker_tpu.convert.export import export_tracker, load_exported
from feartracker_tpu.models.fbnet import TINY_TRUNK
from feartracker_tpu.models.fear_net import FEARNet


def test_export_roundtrip(tmp_path):
    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    paths = export_tracker(
        model, variables, str(tmp_path), template_size=32, instance_size=64,
        feat_size=4, channels=16, quantize=True,
    )
    assert set(paths) == {"tracker_init", "tracker", "tracker_init_quantized", "tracker_quantized"}

    rng = np.random.RandomState(0)
    template = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.float32)
    search = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)

    init_fn = load_exported(paths["tracker_init"])
    feats = init_fn(template)
    assert np.asarray(feats).shape == (1, 4, 4, 16)

    track_fn = load_exported(paths["tracker"])
    bbox, cls = track_fn(search, feats)
    assert np.asarray(bbox).shape == (1, 8, 8, 4)
    assert np.asarray(cls).shape == (1, 8, 8, 1)

    # parity with the live model (normalization baked into the export)
    from feartracker_tpu.convert.fear_weights import imagenet_preprocess

    live_feats = model.apply(
        variables, jnp.asarray(imagenet_preprocess(template[0].astype(np.uint8)))[None],
        method=model.get_features,
    )
    np.testing.assert_allclose(np.asarray(feats), np.asarray(live_feats), atol=1e-4)

    # quantized variant runs and is close
    qtrack = load_exported(paths["tracker_quantized"])
    qbbox, qcls = qtrack(search, feats)
    np.testing.assert_allclose(np.asarray(qcls), np.asarray(cls), atol=0.3)
