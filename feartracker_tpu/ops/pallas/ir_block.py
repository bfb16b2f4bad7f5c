"""Pallas TPU kernel: fused inverted-residual block (expand → depthwise → project).

XLA cannot fuse convolutions into convolutions, so each MobileNetV2-style
block in the FBNet trunk writes its 6×-expanded intermediate to HBM and reads
it back twice (between expand/depthwise and depthwise/project) — the dominant
HBM traffic of the tracking scan step per the roofline analysis in
BENCHMARKS.md. This kernel keeps the expanded tensor in VMEM:

  * expand: 1×1 conv as an MXU matmul over channels, written into a
    zero-padded VMEM scratch (padding must be zero *after* the expand bias +
    ReLU, so padding happens in expanded space, inside the kernel);
  * depthwise k×k: unrolled tap accumulation on the VPU (k² shifted
    multiply-adds against per-channel weights), f32 accumulator;
  * project: 1×1 conv as a second MXU matmul, plus the residual add.

Stride-2 blocks use a parity-plane decomposition: the input is packed outside
the kernel into a single space-to-depth array — the 4 subsampled planes
x[(r_h−p)%2::2, (r_w−p)%2::2] concatenated on channels — and expanded by ONE
matmul against a block-diagonal weight whose per-plane output blocks are
lane-tile (128) aligned. Each plane lands in its own padded scratch, and tap
(dy,dx) reads plane (dy%2, dx%2) at offset (dy//2, dx//2), turning the
strided depthwise into static stride-1 slices that Mosaic lays out cleanly.

Both matmul phases run in H-row chunks so the f32 temporaries stay inside a
fixed budget — full-resolution blocks (e.g. 128²-input stride-2) would
otherwise exceed the ~16 MB scoped-VMEM limit.

Grid: one program per tile of streams (the batch axis); weights stay VMEM-
resident across the grid; the scratch padding is zeroed once at program 0 and
reused (data regions are overwritten every step, pad rows stay zero).

The reference has no analog (its trunk ran eager cuDNN convs,
ref: model_training/model/blocks.py:8-42); this is the Pallas-kernel
obligation of SURVEY.md §2.4 applied to the hottest op in the framework.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feartracker_tpu.models.fbnet import IRBlockSpec

VMEM_LIMIT = 14 * 1024 * 1024  # leave headroom under the ~16 MB scoped limit
_TEMP_BUDGET = 1024 * 1024  # per-phase f32 matmul temporaries


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def sublane_tile(dtype) -> int:
    """Second-minor VMEM tile size for a dtype (lane tile is always 128)."""
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _arr_bytes(shape, dtype) -> int:
    """VMEM footprint with (sublane, lane) tile padding."""
    item = jnp.dtype(dtype).itemsize
    sub = sublane_tile(dtype)
    dims = list(shape)
    dims[-1] = _pad_up(dims[-1], 128)
    if len(dims) >= 2:
        dims[-2] = _pad_up(dims[-2], sub)
    n = 1
    for d in dims:
        n *= d
    return n * item


def _chunk_rows(s_tile: int, width: int, channels: int, total: int) -> int:
    """Rows per matmul chunk: largest divisor of ``total`` whose f32
    (rows·width, channels) temp stays in budget (divisor ⇒ a clean fori_loop)."""
    per_row = s_tile * width * _pad_up(channels, 128) * 4
    target = max(1, _TEMP_BUDGET // max(per_row, 1))
    best = 1
    for c in range(1, total + 1):
        if total % c == 0 and c <= target:
            best = c
    return best


def estimate_vmem(s_tile, H, W, Cin, Ce, Cout, k, s, cdtype) -> int:
    p = k // 2
    ho, wo = H // s, W // s
    cpad = _pad_up(Ce, 128)
    oc = _chunk_rows(s_tile, wo, Ce, ho)
    if s == 1:
        ins = 2 * _arr_bytes((s_tile, H, W, Cin), cdtype)
        scratch = _arr_bytes((s_tile, H + 2 * p, W + 2 * p, Ce), cdtype)
        hc = _chunk_rows(s_tile, W, Ce, H)
        exp_temp = hc * s_tile * W * cpad * 4
    else:
        ins = 2 * _arr_bytes((s_tile, H // 2, W // 2, 4 * Cin), cdtype)
        scratch = 4 * _arr_bytes((s_tile, H // 2 + p, W // 2 + p, Ce), cdtype)
        hc = _chunk_rows(s_tile, W // 2, 4 * cpad, H // 2)
        exp_temp = hc * s_tile * (W // 2) * 4 * cpad * 4
    # fori_loop chunking reuses one buffer set per phase: the accumulator
    # scratch plus ~3 live f32 temporaries of chunk size
    acc = _arr_bytes((s_tile, oc, wo, Ce), jnp.float32)
    temps = max(exp_temp, 3 * acc)
    out = 2 * _arr_bytes((s_tile, ho, wo, Cout), cdtype)
    return ins + scratch + 2 * acc + temps + out


def pick_s_tile(S, H, W, Cin, Ce, Cout, k, s, cdtype) -> int:
    for cand in (16, 8, 4, 2, 1):
        if S % cand == 0 and estimate_vmem(cand, H, W, Cin, Ce, Cout, k, s, cdtype) <= VMEM_LIMIT:
            return cand
    return 0  # does not fit even at one stream per program


def pack_expand_weights(we: jnp.ndarray, be: jnp.ndarray):
    """(Cin, Ce) expand weight → block-diagonal (4·Cin, 4·Cpad) for the packed
    parity-plane input; per-plane output blocks are 128-lane aligned."""
    cin, ce = we.shape
    cpad = _pad_up(ce, 128)
    w4 = jnp.zeros((4 * cin, 4 * cpad), we.dtype)
    b4 = jnp.zeros((1, 4 * cpad), be.dtype)
    for r in range(4):
        w4 = w4.at[r * cin : (r + 1) * cin, r * cpad : r * cpad + ce].set(we)
        b4 = b4.at[:, r * cpad : r * cpad + ce].set(be.reshape(1, ce))
    return w4, b4


def _block_kernel(
    *refs,
    k: int, s: int, H: int, W: int, Cin: int, Ce: int, Cout: int, s_tile: int,
    has_expand: bool, relu_dw: bool, relu_out: bool, residual: bool, cdtype,
):
    p = k // 2
    cpad = _pad_up(Ce, 128)
    x_ref = refs[0]
    i = 1
    if has_expand or s == 2:
        we_ref, be_ref = refs[i], refs[i + 1]
        i += 2
    wd_ref, bd_ref, wp_ref, bp_ref = refs[i : i + 4]
    out_ref = refs[i + 4]
    ep_ref = refs[i + 5]
    Hout, Wout = H // s, W // s

    @pl.when(pl.program_id(0) == 0)
    def _zero_padding():
        ep_ref[...] = jnp.zeros(ep_ref.shape, cdtype)

    # Both phases run as fori_loops over row chunks: an unrolled Python loop
    # makes Mosaic hold every iteration's temporaries live at once (measured:
    # 38 MB scoped VMEM for a kernel whose steady-state footprint is ~7 MB);
    # a fori_loop body compiles once and reuses one buffer set.

    # phase 1: expansion into the zero-padded scratch
    if s == 1:
        hc = _chunk_rows(s_tile, W, Ce, H)

        def expand_chunk(c, _):
            h0 = c * hc
            v = x_ref[:, pl.ds(h0, hc), :, :]
            if has_expand:
                t = jnp.dot(
                    v.reshape(s_tile * hc * W, Cin), we_ref[...],
                    preferred_element_type=jnp.float32,
                )
                t = jax.nn.relu(t + be_ref[...]).astype(cdtype).reshape(s_tile, hc, W, Ce)
            else:
                t = v.astype(cdtype)
            ep_ref[:, pl.ds(p + h0, hc), p : p + W, :] = t
            return 0

        jax.lax.fori_loop(0, H // hc, expand_chunk, 0)
    else:
        H2, W2 = H // 2, W // 2
        hc = _chunk_rows(s_tile, W2, 4 * cpad, H2)

        def expand_chunk(c, _):
            h0 = c * hc
            v = x_ref[:, pl.ds(h0, hc), :, :]  # (s_tile, hc, W2, 4·Cin) packed planes
            t = jnp.dot(
                v.reshape(s_tile * hc * W2, 4 * Cin), we_ref[...],
                preferred_element_type=jnp.float32,
            )
            t = t + be_ref[...]
            if has_expand:
                t = jax.nn.relu(t)
            t = t.astype(cdtype).reshape(s_tile, hc, W2, 4 * cpad)
            for r in range(4):
                rh, rw = r // 2, r % 2
                vh, vw = (p - rh + 1) // 2, (p - rw + 1) // 2
                ep_ref[r, :, pl.ds(vh + h0, hc), vw : vw + W2, :] = t[
                    ..., r * cpad : r * cpad + Ce
                ]
            return 0

        jax.lax.fori_loop(0, H2 // hc, expand_chunk, 0)

    # phase 2: depthwise taps (in-place accumulator scratch) + project
    oc = _chunk_rows(s_tile, Wout, Ce, Hout)

    def out_chunk(c, _):
        o0 = c * oc
        # functional accumulation: Mosaic fuses the k² multiply-adds into one
        # pass over the output tile (an in-place scratch accumulator forces
        # k² separate VMEM read-modify-write sweeps — measured ~2× slower)
        acc = jnp.zeros((s_tile, oc, Wout, Ce), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                w_tap = wd_ref[pl.ds(dy * k + dx, 1), :].reshape(1, 1, 1, Ce)
                if s == 1:
                    tap = ep_ref[:, pl.ds(dy + o0, oc), dx : dx + Wout, :]
                else:
                    r = (dy % 2) * 2 + (dx % 2)
                    tap = ep_ref[r, :, pl.ds(dy // 2 + o0, oc), dx // 2 : dx // 2 + Wout, :]
                acc = acc + tap.astype(jnp.float32) * w_tap
        h = acc + bd_ref[...].reshape(1, 1, 1, Ce)
        if relu_dw:
            h = jax.nn.relu(h)
        y = jnp.dot(
            h.astype(cdtype).reshape(s_tile * oc * Wout, Ce),
            wp_ref[...],
            preferred_element_type=jnp.float32,
        )
        y = y + bp_ref[...]
        if relu_out:
            y = jax.nn.relu(y)
        y = y.astype(cdtype).reshape(s_tile, oc, Wout, Cout)
        if residual:
            y = y + x_ref[:, pl.ds(o0, oc), :, :]
        out_ref[:, pl.ds(o0, oc), :, :] = y
        return 0

    jax.lax.fori_loop(0, Hout // oc, out_chunk, 0)


@functools.partial(
    jax.jit, static_argnames=("spec", "relu_dw", "relu_out", "allow_residual", "interpret")
)
def fused_ir_block(
    x: jnp.ndarray,
    blk: Dict[str, Any],
    spec: IRBlockSpec,
    relu_dw: bool = True,
    relu_out: bool = False,
    allow_residual: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused inverted-residual block.

    Args:
      x: (S, H, W, Cin) activations (bf16 or f32; compute dtype follows).
      blk: folded weights ({"expand": {"w","b"[,"w4","b4"]}|None, "dw",
        "project"} — see :func:`feartracker_tpu.ops.fused_trunk.fold_fear_net`;
        "w4"/"b4" are the pre-packed block-diagonal expand weights for
        stride-2 blocks, built at fold time to keep packing out of the scan).
      spec: the block's IRBlockSpec (kernel/stride static config).
      relu_dw / relu_out: activation placement (IR block: ReLU after expand
        and depthwise, none after project; SepConv-BN-ReLU: none after
        depthwise, ReLU at the end).
    Returns: (S, H/stride, W/stride, Cout).
    """
    S, H, W, Cin = x.shape
    k, s = spec.kernel, spec.stride
    p = k // 2
    cdtype = x.dtype
    has_expand = blk["expand"] is not None
    Ce = blk["dw"]["w"].shape[-1]
    Cout = blk["project"]["w"].shape[-1]
    Hout, Wout = H // s, W // s
    residual = allow_residual and s == 1 and Cin == Cout

    # 0 = the estimator says this does not fit even at one stream per
    # program; production callers gate with fused_trunk.fused_eligible —
    # proceed at s_tile=1 anyway so the estimate can be probed empirically
    # (Mosaic raises a scoped-VMEM error at compile time if it truly fails)
    s_tile = pick_s_tile(S, H, W, Cin, Ce, Cout, k, s, cdtype) or 1

    weights = []
    if s == 2:
        # pack parity planes on channels (space-to-depth); expansion becomes a
        # single block-diagonal matmul with lane-aligned per-plane outputs
        xp = jnp.concatenate(
            [
                x[:, ((rh - p) % 2) :: 2, ((rw - p) % 2) :: 2, :]
                for rh in (0, 1)
                for rw in (0, 1)
            ],
            axis=-1,
        )
        if has_expand:
            if "w4" in blk["expand"]:
                w4, b4 = blk["expand"]["w4"], blk["expand"]["b4"]
            else:
                w4, b4 = pack_expand_weights(blk["expand"]["w"], blk["expand"]["b"])
        else:  # identity unpack: route each plane's channels to its lane block
            w4, b4 = pack_expand_weights(
                jnp.eye(Cin, dtype=cdtype), jnp.zeros((Cin,), jnp.float32)
            )
        weights += [w4.astype(cdtype), b4.astype(jnp.float32)]
        inputs = [xp]
        in_spec = [
            pl.BlockSpec(
                (s_tile, H // 2, W // 2, 4 * Cin), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        scratch = pltpu.VMEM((4, s_tile, H // 2 + p, W // 2 + p, Ce), cdtype)
    else:
        if has_expand:
            weights += [
                blk["expand"]["w"].astype(cdtype),
                blk["expand"]["b"].reshape(1, Ce).astype(jnp.float32),
            ]
        inputs = [x]
        in_spec = [
            pl.BlockSpec((s_tile, H, W, Cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ]
        scratch = pltpu.VMEM((s_tile, H + 2 * p, W + 2 * p, Ce), cdtype)

    weights += [
        blk["dw"]["w"].reshape(k * k, Ce).astype(jnp.float32),
        blk["dw"]["b"].reshape(1, Ce).astype(jnp.float32),
        blk["project"]["w"].astype(cdtype),
        blk["project"]["b"].reshape(1, Cout).astype(jnp.float32),
    ]
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in weights
    ]

    kernel = functools.partial(
        _block_kernel,
        k=k, s=s, H=H, W=W, Cin=Cin, Ce=Ce, Cout=Cout, s_tile=s_tile,
        has_expand=has_expand, relu_dw=relu_dw, relu_out=relu_out,
        residual=residual, cdtype=cdtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(S // s_tile,),
        in_specs=in_spec + weight_specs,
        out_specs=pl.BlockSpec(
            (s_tile, Hout, Wout, Cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hout, Wout, Cout), cdtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(*inputs, *weights)
