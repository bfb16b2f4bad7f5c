"""FEARNet assembly: trunk + neck + BoxTower (ref: model_training/model/fear_net.py).

Three entry points mirror the reference API:
  * ``get_features(crop)``   — trunk + neck (ref: fear_net.py:63-66)
  * ``track(search, template_features[, update])`` — inference step
    (ref: fear_net.py:90-96), with the dual-template ``update`` hook exposed
  * ``__call__((template, search))`` — training forward (ref: fear_net.py:83-88)

Outputs are NHWC maps: regression (B, 16, 16, 4) after exp, classification
logits (B, 16, 16, 1).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from feartracker_tpu.models.blocks import AdjustLayer, BoxTower
from feartracker_tpu.models.fbnet import FBNetTrunk, FEAR_XS_TRUNK, IRBlockSpec, TRUNKS
from feartracker_tpu.utils.constants import (
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
)

# canonical tower depth per family entry: fear_l pairs its wider trunk with a
# deeper 3-conv BoxTower; everything else matches the reference's towernum=2
# (ref: model_training/model/fear_net.py:33 box tower construction)
FAMILY_TOWERNUM = {"fear_tiny": 2, "fear_xs": 2, "fear_m": 2, "fear_l": 3}


def build_family_model(name: str = "fear_xs", dtype: Optional[jnp.dtype] = None,
                       bn_axis_name: Optional[str] = None,
                       towernum: Optional[int] = None) -> "FEARNet":
    """Construct a zoo-family FEARNet (fear_tiny / fear_xs / fear_m / fear_l).

    One place for the name→(trunk, towernum) wiring that the demo, the eval
    harness, the bench tools and the training CLI all need.
    """
    if name not in TRUNKS:
        raise ValueError(f"unknown model {name!r}; choose from {sorted(TRUNKS)}")
    return FEARNet(trunk_blocks=TRUNKS[name],
                   towernum=FAMILY_TOWERNUM[name] if towernum is None else towernum,
                   dtype=dtype, bn_axis_name=bn_axis_name)


class FEARNet(nn.Module):
    trunk_blocks: Sequence[IRBlockSpec] = FEAR_XS_TRUNK
    adjust_channels: int = 256
    towernum: int = 2
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        self.encoder = FBNetTrunk(blocks=self.trunk_blocks, **kw)
        self.neck = AdjustLayer(features=self.adjust_channels, **kw)
        self.connect_model = BoxTower(
            features=self.adjust_channels, towernum=self.towernum, **kw
        )
        # dynamic-template interpolation weight (see forward_dual)
        self.template_gate = self.param(
            "template_gate", lambda k: jnp.zeros((1,), jnp.float32)
        )

    def get_features(self, crop: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.neck(self.encoder(crop, train), train)

    def connector(
        self,
        template_features: jnp.ndarray,
        search_features: jnp.ndarray,
        update_features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        bbox, cls, _, _ = self.connect_model(
            search_features, template_features, update=update_features, train=train
        )
        return {
            TARGET_REGRESSION_LABEL_KEY: bbox,
            TARGET_CLASSIFICATION_KEY: cls,
        }

    def track(
        self,
        search: jnp.ndarray,
        template_features: jnp.ndarray,
        update_features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        search_features = self.get_features(search, train)
        return self.connector(template_features, search_features, update_features, train)

    def __call__(
        self, x: Tuple[jnp.ndarray, jnp.ndarray], train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        template, search = x
        template_features = self.get_features(template, train)
        search_features = self.get_features(search, train)
        return self.connector(template_features, search_features, train=train)

    def forward_dual(
        self, x: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """Dual-template training forward: (template, search, aux_template).

        The classification branch correlates against a LEARNED interpolation
        of the static template and an auxiliary (later-frame) template —
        the trainable dynamic-template module the reference announced but
        never released (ref: README.md:96 "Dynamic Template Update module,
        it'll be added soon"; hook at blocks.py:174-181). The interpolation
        weight ``sigmoid(template_gate)`` is learned end-to-end; at inference
        the scan runtime can reuse it (ScanTracker ``update_mode='gated'``).
        """
        template, search, aux = x
        template_features = self.get_features(template, train)
        search_features = self.get_features(search, train)
        aux_features = self.get_features(aux, train)
        gate = jax.nn.sigmoid(self.template_gate).astype(template_features.dtype)
        update = (1.0 - gate) * template_features + gate * aux_features
        return self.connector(template_features, search_features, update, train=train)
