"""PyTorch-Lightning checkpoint → Flax variables.

Maps a reference training checkpoint (``FEARLightningModel`` .ckpt,
ref: utils/torch.py:12-25) onto the Flax FEARNet tree — including real
BatchNorm parameters and running statistics (unlike the CoreML path, where
BN is pre-folded). Torch is used only as the deserializer.

The mapping is structural: torch's state_dict preserves module definition
order, so convs/BNs are consumed as ordered streams with shape assertions —
any architecture mismatch fails loudly (same approach as the CoreML mapper).
Reference name patterns (``connect_model.cls_encode.matrix11_s...``,
ref: blocks.py:96-172) are used to locate the head blocks.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from feartracker_tpu.models.fbnet import FEAR_XS_TRUNK


def _kernel_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32)


class _Stream:
    """Ordered (name, tensor) stream with typed take()s."""

    def __init__(self, items: List[Tuple[str, np.ndarray]]):
        self.items = items
        self.i = 0

    def assert_consumed(self, what: str) -> None:
        if self.i != len(self.items):
            raise ValueError(
                f"{what}: {len(self.items) - self.i} unconsumed tensors starting at "
                f"{self.peek_name()!r} — architecture mismatch (wrong towernum/channels?)"
            )

    def peek_name(self) -> str:
        return self.items[self.i][0] if self.i < len(self.items) else "<end>"

    def take_conv(self, out_ch: int, kernel: int, groups: int = 1, bias: bool = False):
        name, w = self.items[self.i]
        assert name.endswith(".weight") and w.ndim == 4, f"expected conv at {name}"
        assert w.shape[0] == out_ch and w.shape[2] == kernel, (
            f"conv {name}: got {w.shape}, want out={out_ch} k={kernel}"
        )
        self.i += 1
        params = {"kernel": _kernel_hwio(w)}
        if bias:
            bname, b = self.items[self.i]
            assert bname.endswith(".bias") and b.ndim == 1, f"expected conv bias at {bname}"
            params["bias"] = b.astype(np.float32)
            self.i += 1
        return params

    def take_bn(self, ch: int):
        names = [self.items[self.i + k][0] for k in range(4)]
        vals = [self.items[self.i + k][1] for k in range(4)]
        assert names[0].endswith(".weight") and vals[0].ndim == 1 and vals[0].shape[0] == ch, names
        assert names[1].endswith(".bias"), names
        assert "running_mean" in names[2] and "running_var" in names[3], names
        self.i += 4
        # torch also stores num_batches_tracked
        if self.i < len(self.items) and "num_batches_tracked" in self.items[self.i][0]:
            self.i += 1
        return (
            {"scale": vals[0].astype(np.float32), "bias": vals[1].astype(np.float32)},
            {"mean": vals[2].astype(np.float32), "var": vals[3].astype(np.float32)},
        )


def _conv_bn(stream: _Stream, out: int, kernel: int):
    conv = stream.take_conv(out, kernel, bias=False)
    bn_p, bn_s = stream.take_bn(out)
    return {"conv": conv, "bn": bn_p}, {"bn": bn_s}


def _sep_bn(stream: _Stream, in_ch: int, out: int, use_bias: bool):
    dw = stream.take_conv(in_ch, 3, groups=in_ch, bias=use_bias)
    pw = stream.take_conv(out, 1, bias=use_bias)
    bn_p, bn_s = stream.take_bn(out)
    return {"sep": {"dw": dw, "pw": pw}, "bn": bn_p}, {"bn": bn_s}


def lightning_to_variables(state_dict: Dict[str, np.ndarray], channels: int = 256, towernum: int = 2):
    """Flat reference state dict (``model.`` prefix stripped) → Flax
    {'params', 'batch_stats'}."""
    enc_items = [(k, v) for k, v in state_dict.items() if k.startswith("encoder.")]
    neck_items = [(k, v) for k, v in state_dict.items() if k.startswith("neck.")]
    head_items = [(k, v) for k, v in state_dict.items() if k.startswith("connect_model.")]

    # --- encoder: stem + 16 IR blocks, ordered conv/BN pairs ---
    s = _Stream(enc_items)
    enc_p: Dict[str, dict] = {}
    enc_s: Dict[str, dict] = {}
    enc_p["stem"], enc_s["stem"] = _conv_bn(s, 16, 3)
    in_ch = 16
    for i, spec in enumerate(FEAR_XS_TRUNK):
        bp: Dict[str, dict] = {}
        bs: Dict[str, dict] = {}
        ch = in_ch
        if spec.expansion != 1:
            ch = in_ch * spec.expansion
            bp["expand"], bs["expand"] = _conv_bn(s, ch, 1)
        bp["dw"], bs["dw"] = _conv_bn(s, ch, spec.kernel)
        bp["project"], bs["project"] = _conv_bn(s, spec.out_channels, 1)
        enc_p[f"block{i}"], enc_s[f"block{i}"] = bp, bs
        in_ch = spec.out_channels
    # any trailing encoder stages (stages[4:], unused by max_layer=4) are ignored

    # --- neck ---
    s = _Stream(neck_items)
    np_, ns = _conv_bn(s, channels, 1)
    s.assert_consumed("neck")
    neck_p, neck_s = {"downsample": np_}, {"downsample": ns}

    # --- head: use reference name prefixes to slice per block ---
    def sub(prefix):
        return _Stream([(k, v) for k, v in head_items if k.startswith(prefix)])

    head_p: Dict[str, dict] = {}
    head_s: Dict[str, dict] = {}
    for name in ("cls_encode", "reg_encode"):
        st = sub(f"connect_model.{name}.")
        head_p[name], head_s[name] = _sep_bn(st, channels, channels, use_bias=False)
        st.assert_consumed(name)
    for name, flax_name in (("cls_dw", "cls_dw"), ("reg_dw", "reg_dw")):
        st = sub(f"connect_model.{name}.")
        p, stt = _sep_bn(st, channels + 64, channels, use_bias=True)
        st.assert_consumed(name)
        head_p[flax_name], head_s[flax_name] = {"enc": p}, {"enc": stt}

    for tower, flax_prefix in (("bbox_tower", "bbox_tower"), ("cls_tower", "cls_tower")):
        st = sub(f"connect_model.{tower}.")
        for i in range(towernum):
            head_p[f"{flax_prefix}{i}"], head_s[f"{flax_prefix}{i}"] = _sep_bn(
                st, channels, channels, use_bias=True
            )
        st.assert_consumed(f"{tower} (towernum={towernum})")

    for pred, out_ch in (("bbox_pred", 4), ("cls_pred", 1)):
        st = sub(f"connect_model.{pred}.")
        dw = st.take_conv(channels, 3, bias=True)
        pw = st.take_conv(out_ch, 1, bias=True)
        st.assert_consumed(pred)
        head_p[pred] = {"dw": dw, "pw": pw}

    head_p["adjust"] = np.asarray(state_dict["connect_model.adjust"], np.float32).reshape(1)
    head_p["bias"] = np.asarray(state_dict["connect_model.bias"], np.float32).reshape(1, 1, 1, 4)
    head_p["cls_scale"] = np.full((1,), 0.1, np.float32)  # literal 0.1 (blocks.py:192)

    return {
        "params": {
            "encoder": enc_p,
            "neck": neck_p,
            "connect_model": head_p,
            "template_gate": np.zeros((1,), np.float32),
        },
        "batch_stats": {"encoder": enc_s, "neck": neck_s, "connect_model": head_s},
    }


def load_from_lightning(path: str, channels: int = 256, towernum: int = 2):
    """One-call loader: .ckpt path → Flax variables
    (the fixed version of ref utils/torch.py:12-25)."""
    from feartracker_tpu.train.checkpoint import load_lightning_checkpoint

    return lightning_to_variables(load_lightning_checkpoint(path), channels, towernum)
