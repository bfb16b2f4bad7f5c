"""Format-dispatching weight loader shared by the CLIs.

One entry point for every weight source a user has (the reference's
``load_from_lighting`` covered only its own .ckpt files —
ref: utils/torch.py:12-25):

* ``.mlmodel`` — the reference's released CoreML export, recovered by the
  raw-protobuf reader (`convert/coreml.py`);
* ``.ckpt``    — a reference PyTorch-Lightning checkpoint;
* ``.npz``     — a flat variables archive written by
  ``tools/export_weights.py`` (incl. the packaged standalone FEAR-XS);
* a directory  — an Orbax training checkpoint from this framework
  (experiment dir, checkpoints root, managed step dir or state dir).
"""

from __future__ import annotations

import os
from typing import Any, Dict

PACKAGED_FEAR_XS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "weights", "fear_xs.npz")
REFERENCE_MLMODEL = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"


def default_weights_path() -> str:
    """The reference CoreML export when mounted, else the packaged
    bit-identical standalone archive."""
    return REFERENCE_MLMODEL if os.path.exists(REFERENCE_MLMODEL) else PACKAGED_FEAR_XS


def load_npz_variables(path: str) -> Dict[str, Any]:
    """Variables from a ``tools/export_weights.py`` archive ('/'-joined
    nested keys → the {"params", "batch_stats"} pytree)."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        return unflatten_dict({tuple(k.split("/")): z[k] for k in z.files})


def transfer_variables(
    loaded: Dict[str, Any], target: Dict[str, Any]
) -> "tuple[Dict[str, Any], Dict[str, list]]":
    """Non-strict weight transfer — the analog of the reference's
    ``strict=False → transfer_weights`` fallback (ref: utils/torch.py:21-24):
    copy every leaf whose path AND shape match the target, leave the rest at
    the target's freshly initialized values.

    Returns ``(merged, report)`` where ``merged`` mirrors ``target``'s
    structure and ``report`` maps '/'-joined paths:
    ``transferred`` (copied), ``skipped_shape`` (path match, shape mismatch),
    ``missing`` (in target only — stays initialized), ``unused`` (in source
    only — dropped). Enables trunk-only warm starts across head/towernum
    variants where the all-or-nothing importers refuse."""
    import numpy as np
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_t = flatten_dict(target)
    flat_l = flatten_dict(loaded)
    report = {"transferred": [], "skipped_shape": [], "missing": [], "unused": []}
    merged = {}
    for k, v in flat_t.items():
        name = "/".join(k)
        if k in flat_l:
            if tuple(np.shape(flat_l[k])) == tuple(np.shape(v)):
                # cast to the target leaf's dtype: a float16/float64 source
                # must not silently smuggle mixed precision into the state
                merged[k] = np.asarray(flat_l[k], np.asarray(v).dtype)
                report["transferred"].append(name)
            else:
                merged[k] = v
                report["skipped_shape"].append(name)
        else:
            merged[k] = v
            report["missing"].append(name)
    report["unused"] = sorted("/".join(k) for k in flat_l if k not in flat_t)
    return unflatten_dict(merged), report


def load_variables(path: str, channels: int = 256, towernum: int = 2) -> Dict[str, Any]:
    """FEARNet variables ``{"params", "batch_stats"}`` from any supported
    weight source (see module docstring). ``channels``/``towernum`` apply to
    the .mlmodel/.ckpt importers (Orbax/.npz sources carry their structure).
    A bare model-zoo name ("fear_xs", "fear_xs_noembs") resolves to the
    packaged archive."""
    zoo = os.path.join(os.path.dirname(PACKAGED_FEAR_XS), f"{path}.npz")
    if os.sep not in path and os.path.exists(zoo):
        path = zoo
    if os.path.isdir(path):
        from feartracker_tpu.train.checkpoint import load_orbax_variables

        return load_orbax_variables(path)
    if path.endswith(".ckpt"):
        from feartracker_tpu.convert.lightning import load_from_lightning

        return load_from_lightning(path, channels=channels, towernum=towernum)
    if path.endswith(".npz"):
        return load_npz_variables(path)
    from feartracker_tpu.convert.fear_weights import load_fear_xs

    return load_fear_xs(path, channels=channels, towernum=towernum)
