"""Post-training int8 (w8a8) inference for the UNet-Xception segmentor.

STATUS: opt-in experiment (TMAT_TPU_INT8=1 / quantize=True), NOT the
production default. Measured end to end on a v5e chip at production
geometry (batch 200, patch 320, shipped checkpoint):

  | variant                               | vs bf16 | IoU vs f32 |
  |---------------------------------------|---------|------------|
  | float-domain PTQ (per-channel scales) |  0.81x  | 0.991      |
  | full integer-domain graph             |  0.84x  | 0.978      |
  | mixed (int8 only at deep up convs)    |  1.03x  | 0.981      |

Why int8 loses here despite the MXU's 2x int8 peak: XLA-TPU cannot emit
a narrow type from an integer convolution, so every s8 x s8 conv
materializes an s32 (4-byte) intermediate plus a separate requant pass —
per conv that is ~9 bytes/elem of traffic vs the bf16 path's ~4. Op-level
probes that amortize this (benchmarks/int8_probe.py,
benchmarks/int8_fusion_probe.py) show int8 winning 1.28-1.48x at
compute-bound shapes, which is why the "mixed" variant (int8 only where
compute dominates) is the only one at parity or better. The quality gap
(0.98 vs the 0.99 bf16 bar) comes from quantizing the deep up-path convs
themselves; closing it would need quantization-aware finetuning.

Everything is kept tested and documented as empirical support for the
roofline conclusion (BASELINE.md "int8 quantization" section), mirroring
the fused-Pallas-UNet experiment.

Scheme (standard symmetric PTQ):
  - inference BatchNorm is folded into the preceding conv's weights/bias
    (the Keras/Flax graph is conv -> BN everywhere except the residual
    1x1 convs and the head, reference models.py:85-171);
  - weights: per-output-channel symmetric int8 (scale = max|w|/127);
  - activations: per-INPUT-CHANNEL symmetric scales from a percentile
    |x| calibration pass over representative patches. Per-channel input
    scales cost nothing on the MXU: they fold into the weight tensor
    along its input-channel axis before weight quantization, so the
    epilogue multiplier stays per-output-channel. (Per-tensor activation
    scales measured IoU 0.976 vs f32 on the shipped checkpoint —
    post-BN-folding channel ranges are too heterogeneous.);
  - the sigmoid head stays float (quality guard).

The folded plain-lax forward (`forward_folded`) doubles as the structure
oracle: tests pin it to `model.apply` within float tolerance, so the
quantized paths differ from production f32 only by quantization noise.
Quality floors are pinned in tests/test_quant.py.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BN_EPS = 1e-3  # reference models.py BatchNormalization(epsilon=1e-3)
DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# BN folding / layer extraction
# ---------------------------------------------------------------------------


def _fold_bn(w, b, bn_p, bn_s):
    """Fold an inference-mode BatchNorm into the preceding conv."""
    s = np.asarray(bn_p["scale"]) / np.sqrt(np.asarray(bn_s["var"]) + BN_EPS)
    w = np.asarray(w) * s  # broadcasts over the output-channel (last) axis
    b = np.zeros(w.shape[-1], np.float32) if b is None else np.asarray(b)
    b = (b - np.asarray(bn_s["mean"])) * s + np.asarray(bn_p["bias"])
    return w.astype(np.float32), b.astype(np.float32)


def extract_folded(variables, filter_counts: Sequence[int]) -> Dict[str, dict]:
    """Flatten the Flax tree into tag -> {w, b, kind, stride} with BN folded.

    Tags follow the forward structure: ``entry``; ``d{i}.dw1/pw1/dw2/pw2/res``
    per down block; ``u{j}.t1/t2/res`` per up block; ``head``.
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    n_down = len(filter_counts) - 1
    n_up = len(filter_counts)
    out: Dict[str, dict] = {}

    def conv(name):
        c = p[name]
        return np.asarray(c["kernel"]), np.asarray(c["bias"])

    def spec(w, b, kind="conv", stride=1):
        return {"w": np.asarray(w, np.float32),
                "b": None if b is None else np.asarray(b, np.float32),
                "kind": kind, "stride": stride}

    w, b = conv("Conv_0")
    w, b = _fold_bn(w, b, p["BatchNorm_0"], bs["BatchNorm_0"])
    out["entry"] = spec(w, b, stride=2)

    bn_i = 1
    for i in range(n_down):
        for k, sep in ((1, f"SeparableConv_{2 * i}"), (2, f"SeparableConv_{2 * i + 1}")):
            dw = np.asarray(p[sep]["depthwise"]["kernel"])
            pw = np.asarray(p[sep]["pointwise"]["kernel"])
            pb = np.asarray(p[sep]["pointwise"]["bias"])
            pw, pb = _fold_bn(pw, pb, p[f"BatchNorm_{bn_i}"], bs[f"BatchNorm_{bn_i}"])
            bn_i += 1
            out[f"d{i}.dw{k}"] = spec(dw, None, kind="dw")
            out[f"d{i}.pw{k}"] = spec(pw, pb)
        w, b = conv(f"Conv_{1 + i}")
        out[f"d{i}.res"] = spec(w, b, stride=2)

    for j in range(n_up):
        for k, name in ((1, f"ConvTranspose_{2 * j}"), (2, f"ConvTranspose_{2 * j + 1}")):
            w, b = conv(name)
            w, b = _fold_bn(w, b, p[f"BatchNorm_{bn_i}"], bs[f"BatchNorm_{bn_i}"])
            bn_i += 1
            out[f"u{j}.t{k}"] = spec(w, b, kind="convT")
        w, b = conv(f"Conv_{1 + n_down + j}")
        out[f"u{j}.res"] = spec(w, b)

    w, b = conv(f"Conv_{1 + n_down + n_up}")
    out["head"] = spec(w, b)
    out["_n"] = {"down": n_down, "up": n_up}
    return out


# ---------------------------------------------------------------------------
# Shared forward structure (reference models.py:85-171, inference mode)
# ---------------------------------------------------------------------------


def _maxpool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )


def _upsample2(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _structure(
    x,
    conv: Callable[[str, jax.Array], jax.Array],
    n_down: int,
    n_up: int,
    rec: Optional[Callable[[str, jax.Array], jax.Array]] = None,
):
    """Layer order of reference models.py:85-171 (inference mode).

    ``rec`` is an identity hook at the residual-add sites (operands and
    sums) used by the calibration pass; the quantized forward needs
    scales there, not only at conv inputs.
    """
    r = (lambda tag, h: h) if rec is None else rec
    x = conv("entry", x)
    x = jax.nn.relu(x)
    prev = x
    for i in range(n_down):
        h = jax.nn.relu(x) if i != 0 else x
        h = conv(f"d{i}.pw1", conv(f"d{i}.dw1", h))
        h = jax.nn.relu(h)
        h = conv(f"d{i}.pw2", conv(f"d{i}.dw2", h))
        h = r(f"d{i}.main", _maxpool(h))
        x = r(f"d{i}.sum", h + r(f"d{i}.res_out", conv(f"d{i}.res", prev)))
        prev = x
    for j in range(n_up):
        h = jax.nn.relu(x)
        h = conv(f"u{j}.t1", h)
        h = jax.nn.relu(h)
        h = r(f"u{j}.main", conv(f"u{j}.t2", h))
        h = _upsample2(h)
        x = r(
            f"u{j}.sum",
            h + _upsample2(r(f"u{j}.res_out", conv(f"u{j}.res", prev))),
        )
        prev = x
    y = conv("head", x)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _conv_f32(sp, x):
    """Float conv at the dtype of x (f32 oracle, bf16 mixed forward)."""
    w = jnp.asarray(sp["w"])
    if jnp.issubdtype(x.dtype, jnp.floating):
        w = w.astype(x.dtype)
    else:
        x = x.astype(w.dtype)
    if sp["kind"] == "convT":
        y = lax.conv_transpose(
            x, w, (1, 1), "SAME",
            dimension_numbers=DN, transpose_kernel=False,
        )
    else:
        groups = w.shape[-1] if sp["kind"] == "dw" else 1
        y = lax.conv_general_dilated(
            x, w, (sp["stride"],) * 2, "SAME",
            feature_group_count=groups, dimension_numbers=DN,
        )
    if sp["b"] is not None:
        y = y + jnp.asarray(sp["b"]).astype(y.dtype)
    return y


def forward_folded(folded, x, collect: bool = False):
    """f32 forward over the folded layers; optionally returns per-channel
    percentile |x| stats at every conv input and residual-add site (the
    calibration pass)."""
    stats: Dict[str, jax.Array] = {}

    def _stat(h):
        # per-channel 99.95th percentile over (batch, H, W). Spatially
        # subsample 4x4 first: jnp.percentile sorts per channel, and the
        # full 320px raster makes the one-time CPU calibration pass take
        # minutes; ~50k samples/channel changes the scale estimate by
        # <<1 quantization step.
        a = jnp.abs(h).astype(jnp.float32)
        if a.ndim == 4 and a.shape[1] >= 16:
            a = a[:, ::4, ::4, :]
        return jnp.percentile(a.reshape(-1, a.shape[-1]), 99.95, axis=0)

    def conv(tag, h):
        if collect:
            stats[tag] = _stat(h)
        return _conv_f32(folded[tag], h)

    def rec(tag, h):
        if collect:
            stats[tag] = _stat(h)
        return h

    y = _structure(
        x.astype(jnp.float32), conv,
        folded["_n"]["down"], folded["_n"]["up"], rec=rec,
    )
    return (y, stats) if collect else y


# ---------------------------------------------------------------------------
# Calibration + weight quantization
# ---------------------------------------------------------------------------


def default_calibration_batch(patch_size: int, n: int = 16, seed: int = 7) -> np.ndarray:
    """Representative patches: synthetic vessels rescaled to [0, 1] (the
    production input contract, compute_branches.py rescale_intensity), half
    of them zeroed outside a disk to mimic well masking."""
    from numpy.random import RandomState

    from tmat_tpu.models.synthetic import synth_vessel_image

    rng = RandomState(seed)
    imgs = []
    yy, xx = np.mgrid[:patch_size, :patch_size]
    disk = ((yy - patch_size / 2) ** 2 + (xx - patch_size / 2) ** 2) < (
        patch_size * 0.55
    ) ** 2
    for k in range(n):
        img, _ = synth_vessel_image(rng, size=patch_size)
        img = img.astype(np.float32)
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-6)
        if k % 2:
            img = img * disk
        imgs.append(img[..., None])
    return np.stack(imgs).astype(np.float32)


def calibrate(folded, batch: np.ndarray) -> Dict[str, np.ndarray]:
    """Run the collection pass (on the host CPU backend when available, so
    segmentor construction never waits on a remote TPU compile) and return
    static per-input-channel activation scales."""
    fn = lambda x: forward_folded(folded, x, collect=True)[1]
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            stats = jax.jit(fn)(jnp.asarray(batch))
    except RuntimeError:  # no cpu platform registered
        stats = jax.jit(fn)(jnp.asarray(batch))
    return {
        tag: (np.maximum(np.asarray(v, np.float64), 1e-6) / 127.0).astype(np.float32)
        for tag, v in jax.device_get(stats).items()
    }


def _tensor_scales(scales: Dict[str, np.ndarray], n_down: int, n_up: int):
    """Storage scale of every int8 tensor in the integer-domain graph.

    Each residual addend keeps its own per-channel scale (its conv
    epilogue's output scale); the add itself rescales both operands to
    the sum's calibrated scale in one fused elementwise pass. (A shared
    max(main, res, sum) addend scale measured IoU 0.979 vs f32 — too
    coarse; dedicated scales recover the v1 float-domain quality.)
    """

    def s(tag):
        return np.asarray(scales[tag], np.float64)

    t: Dict[str, np.ndarray] = {"img": s("entry")}
    t["entry_out"] = s("d0.dw1")  # post-relu entry output
    for i in range(n_down):
        t[f"d{i}.dw1_out"] = s(f"d{i}.pw1")
        t[f"d{i}.pw1_out"] = s(f"d{i}.dw2")  # post-relu
        t[f"d{i}.dw2_out"] = s(f"d{i}.pw2")
        t[f"d{i}.main"] = s(f"d{i}.main")
        t[f"d{i}.res_out"] = s(f"d{i}.res_out")
        t[f"d{i}.add"] = s(f"d{i}.sum")
    for j in range(n_up):
        t[f"u{j}.t1_out"] = s(f"u{j}.t2")  # post-relu
        t[f"u{j}.main"] = s(f"u{j}.main")
        t[f"u{j}.res_out"] = s(f"u{j}.res_out")
        t[f"u{j}.add"] = s(f"u{j}.sum")
    return t


def quantize_folded(
    folded,
    scales: Dict[str, np.ndarray],
    quantize_depthwise: bool = True,
    f32_tags: Tuple[str, ...] = (),
    float_tail: bool = True,
) -> Dict[str, dict]:
    """Build the integer-domain graph parameters.

    Every inter-op tensor is int8 with a static per-channel scale; each
    conv's epilogue fuses dequant + bias + (relu) + requant-to-output-scale
    into one multiply-add chain: q_out = clip(round(relu(i32 * m + c))),
    m = s_w/s_out, c = b/s_out. A float-domain first attempt measured
    0.81x vs bf16 end-to-end because conv inputs materialize as int8
    WHILE pool/add consumers also materialize float copies
    (bytes-accessed 6.4e10 vs 4.4e10, benchmarks/int8_fusion_probe.py
    methodology); keeping relu/maxpool/adds in the quantized domain makes
    each activation materialize exactly once at one byte.

    ``float_tail``: the LAST up block's t2/res epilogues skip the output
    requant and emit ``float_dtype``; the final residual add and the head
    conv then run in float. Measured effect: marginal (IoU 0.978 with or
    without on the shipped checkpoint — the quality gap lives in the deep
    quantized convs, not the tail) but it removes two roundings at the
    most logit-sensitive site for the cost of one bf16 tensor, so it
    stays on. The mixed path (quantize_mixed) is what recovers speed;
    nothing in the all-int8 design recovered the 0.99 bar.
    """
    n_down, n_up = folded["_n"]["down"], folded["_n"]["up"]
    ts = _tensor_scales(scales, n_down, n_up)

    # conv tag -> (input storage scale, output storage scale, relu folded)
    wiring: Dict[str, Tuple[np.ndarray, Optional[np.ndarray], bool]] = {
        "entry": (ts["img"], ts["entry_out"], True)
    }
    for i in range(n_down):
        s_prev = ts["entry_out"] if i == 0 else ts[f"d{i - 1}.add"]
        wiring[f"d{i}.dw1"] = (s_prev, ts[f"d{i}.dw1_out"], False)
        wiring[f"d{i}.pw1"] = (ts[f"d{i}.dw1_out"], ts[f"d{i}.pw1_out"], True)
        wiring[f"d{i}.dw2"] = (ts[f"d{i}.pw1_out"], ts[f"d{i}.dw2_out"], False)
        wiring[f"d{i}.pw2"] = (ts[f"d{i}.dw2_out"], ts[f"d{i}.main"], False)
        wiring[f"d{i}.res"] = (s_prev, ts[f"d{i}.res_out"], False)
    for j in range(n_up):
        s_prev = ts[f"d{n_down - 1}.add"] if j == 0 else ts[f"u{j - 1}.add"]
        wiring[f"u{j}.t1"] = (s_prev, ts[f"u{j}.t1_out"], True)
        wiring[f"u{j}.t2"] = (ts[f"u{j}.t1_out"], ts[f"u{j}.main"], False)
        wiring[f"u{j}.res"] = (s_prev, ts[f"u{j}.res_out"], False)
    wiring["head"] = (ts[f"u{n_up - 1}.add"], None, False)

    q: Dict[str, dict] = {
        "_n": folded["_n"],
        "_img_scale": ts["img"].astype(np.float32),
    }
    # residual-add rescale multipliers (per channel): operands at their own
    # epilogue scales -> sum at the sum's calibrated scale
    for i in range(n_down):
        q[f"_add.d{i}"] = {
            "mA": (ts[f"d{i}.main"] / ts[f"d{i}.add"]).astype(np.float32),
            "mB": (ts[f"d{i}.res_out"] / ts[f"d{i}.add"]).astype(np.float32),
        }
    for j in range(n_up):
        q[f"_add.u{j}"] = {
            "mA": (ts[f"u{j}.main"] / ts[f"u{j}.add"]).astype(np.float32),
            "mB": (ts[f"u{j}.res_out"] / ts[f"u{j}.add"]).astype(np.float32),
        }
    for tag, (s_in, s_out, relu) in wiring.items():
        sp = folded[tag]
        s_in = np.asarray(s_in, np.float64)
        w = sp["w"].astype(np.float64)
        if sp["kind"] == "dw":
            # kernel (kh, kw, 1, C): input channel c is output channel c
            w = w * s_in[None, None, None, :]
        else:
            w = w * s_in[None, None, :, None]
        b = np.zeros(w.shape[-1]) if sp["b"] is None else sp["b"].astype(np.float64)
        tail = float_tail and tag in (f"u{n_up - 1}.t2", f"u{n_up - 1}.res")
        if tag == "head" and float_tail:
            # head consumes the float tail directly: no input-scale folding
            q[tag] = {
                "quant": False,
                "w": sp["w"].astype(np.float32),
                "b": b.astype(np.float32),
                "inv_sout": None,
                "float_in": True,
                "relu": relu,
                "kind": sp["kind"],
                "stride": sp["stride"],
            }
            continue
        do_quant = (
            tag != "head"
            and tag not in f32_tags
            and not (sp["kind"] == "dw" and not quantize_depthwise)
        )
        if do_quant:
            s_w = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
            s_w = np.where(s_w == 0, 1.0, s_w)
            wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
            q[tag] = {
                "quant": True,
                "wq": wq,
                "m": (s_w / s_out).astype(np.float32),
                "c": (b / s_out).astype(np.float32),
                # float_out: skip the requant, emit float at true scale
                # (undo the /s_out baked into m and c)
                "sout": s_out.astype(np.float32) if tail else None,
                "relu": relu,
                "kind": sp["kind"],
                "stride": sp["stride"],
            }
        else:
            q[tag] = {
                "quant": False,
                "w": w.astype(np.float32),  # input scale already folded in
                "b": b.astype(np.float32),
                "inv_sout": None if (s_out is None or tail)
                else (1.0 / s_out).astype(np.float32),
                "float_in": False,
                "relu": relu,
                "kind": sp["kind"],
                "stride": sp["stride"],
            }
    return q


def _maxpool_q(q):
    return lax.reduce_window(
        q, jnp.int8(-128), lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )


def _add_q(a, m_a, b, m_b):
    """Residual add of two int8 tensors, each at its own per-channel scale.

    Computed as a float32 multiply-add (dequant both operands to the sum's
    scale), then round + clip to [-127, 127] and cast back to int8 — XLA
    fuses the whole thing into one elementwise pass. There is no integer
    intermediate: f32 holds every s8*scale product exactly, so this is
    bit-identical to a hypothetical widened-integer add at the same scales.
    """
    s = a.astype(jnp.float32) * m_a + b.astype(jnp.float32) * m_b
    return jnp.clip(jnp.round(s), -127, 127).astype(jnp.int8)


def forward_quant(qparams, x, float_dtype=jnp.bfloat16):
    """The integer-domain w8a8 forward.

    Every inter-op tensor is int8 (relu = max(q, 0), maxpool on int8 —
    both commute with symmetric dequantization; residual adds dequantize
    both operands to f32 at the sum's scale, multiply-add, then round and
    clip back to int8 — see _add_q). Each conv is s8 x s8 -> s32 on the
    MXU with the dequant+bias+relu+requant epilogue fused into its output.
    Only the head runs in ``float_dtype`` (bf16 in production, matching
    the bf16 path this replaces) with a float32 sigmoid.

    Mirrors _structure()'s layer order; kept separate because the pool/
    add/relu ops differ in the quantized domain. Both are pinned to
    ``model.apply`` by tests/test_quant.py.
    """
    n_down, n_up = qparams["_n"]["down"], qparams["_n"]["up"]

    def conv(tag, q):
        sp = qparams[tag]
        if sp["quant"]:
            wq = jnp.asarray(sp["wq"])
            if sp["kind"] == "convT":
                y = lax.conv_transpose(
                    q, wq, (1, 1), "SAME", dimension_numbers=DN,
                    transpose_kernel=False, preferred_element_type=jnp.int32,
                )
            else:
                groups = wq.shape[-1] if sp["kind"] == "dw" else 1
                y = lax.conv_general_dilated(
                    q, wq, (sp["stride"],) * 2, "SAME",
                    feature_group_count=groups, dimension_numbers=DN,
                    preferred_element_type=jnp.int32,
                )
            y = y.astype(jnp.float32) * jnp.asarray(sp["m"]) + jnp.asarray(sp["c"])
            if sp["relu"]:
                y = jnp.maximum(y, 0.0)
            if sp.get("sout") is not None:  # float-tail epilogue
                return (y * jnp.asarray(sp["sout"])).astype(float_dtype)
            return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        # float fallback (head, or ops excluded from quantization): the
        # input storage scale is already folded into w
        w = jnp.asarray(sp["w"], float_dtype)
        xf = q.astype(float_dtype)
        if sp["kind"] == "convT":
            y = lax.conv_transpose(
                xf, w, (1, 1), "SAME", dimension_numbers=DN,
                transpose_kernel=False, preferred_element_type=jnp.float32,
            )
        else:
            groups = w.shape[-1] if sp["kind"] == "dw" else 1
            y = lax.conv_general_dilated(
                xf, w, (sp["stride"],) * 2, "SAME",
                feature_group_count=groups, dimension_numbers=DN,
                preferred_element_type=jnp.float32,
            )
        y = y + jnp.asarray(sp["b"])
        if sp["relu"]:
            y = jnp.maximum(y, 0.0)
        if sp["inv_sout"] is None:
            return y  # head: stays float
        return jnp.clip(
            jnp.round(y * jnp.asarray(sp["inv_sout"])), -127, 127
        ).astype(jnp.int8)

    inv_img = jnp.asarray(1.0 / qparams["_img_scale"], jnp.float32)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv_img), -127, 127
    ).astype(jnp.int8)

    # entry (relu folded into the epilogue); prev is the post-relu output
    q = conv("entry", q)
    prev = q
    for i in range(n_down):
        h = jnp.maximum(q, 0) if i != 0 else q
        h = conv(f"d{i}.pw1", conv(f"d{i}.dw1", h))
        # pw1's epilogue already applied relu
        h = conv(f"d{i}.pw2", conv(f"d{i}.dw2", h))
        h = _maxpool_q(h)
        ad = qparams[f"_add.d{i}"]
        q = _add_q(
            h, jnp.asarray(ad["mA"]),
            conv(f"d{i}.res", prev), jnp.asarray(ad["mB"]),
        )
        prev = q
    for j in range(n_up):
        h = jnp.maximum(q, 0)
        h = conv(f"u{j}.t1", h)
        # t1's epilogue already applied relu
        h = conv(f"u{j}.t2", h)
        h = _upsample2(h)
        res = _upsample2(conv(f"u{j}.res", prev))
        if h.dtype == jnp.int8:
            au = qparams[f"_add.u{j}"]
            q = _add_q(h, jnp.asarray(au["mA"]), res, jnp.asarray(au["mB"]))
        else:  # float tail: operands already at true scale
            q = h + res
        prev = q
    y = conv("head", q)
    return jax.nn.sigmoid(y.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Mixed precision: int8 only where the MXU is compute-bound
# ---------------------------------------------------------------------------

# The deep up-block convs (20-80 px spatial, 128-512 channels) are the only
# sites where s8xs8 beats bf16 ON THIS RUNTIME once the forced s32 conv
# output materialization is paid (XLA-TPU cannot emit s8 or bf16 from an
# integer convolution, so every int8 conv costs a 4-byte intermediate +
# a separate requant pass; measured per-shape in
# benchmarks/int8_fusion_probe.py: 1.28-1.43x at deep shapes, a loss at
# bandwidth-bound ones — and a full integer-domain graph measured 0.84x
# end-to-end despite 1-byte inter-op storage).
DEFAULT_MIXED_TAGS = ("u0.t1", "u0.t2", "u1.t1", "u1.t2", "u2.t1", "u2.t2")


def quantize_mixed(
    folded, scales: Dict[str, np.ndarray],
    tags: Sequence[str] = DEFAULT_MIXED_TAGS,
) -> Dict[str, dict]:
    """Per-conv int8 parameters for the mixed forward: float storage
    everywhere; the listed convs requantize their input on the fly and
    dequantize exactly (no output rounding)."""
    q: Dict[str, dict] = {"_n": folded["_n"], "_mixed": True}
    for tag, sp in folded.items():
        if tag == "_n":
            continue
        if tag not in tags:
            q[tag] = {**sp, "quant": False}
            continue
        s_in = np.asarray(scales[tag], np.float64)
        w = sp["w"].astype(np.float64)
        if sp["kind"] == "dw":
            w = w * s_in[None, None, None, :]
        else:
            w = w * s_in[None, None, :, None]
        s_w = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        s_w = np.where(s_w == 0, 1.0, s_w)
        b = np.zeros(w.shape[-1]) if sp["b"] is None else sp["b"]
        q[tag] = {
            "quant": True,
            "wq": np.clip(np.round(w / s_w), -127, 127).astype(np.int8),
            "inv_sx": (1.0 / s_in).astype(np.float32),
            "eff": s_w.astype(np.float32),
            "b": b.astype(np.float32),
            "kind": sp["kind"],
            "stride": sp["stride"],
        }
    return q


def forward_mixed(qparams, x, float_dtype=jnp.bfloat16):
    """bf16 forward with int8 MXU convs at the compute-bound sites.
    Shares _structure() with the f32 parity oracle."""

    def conv(tag, h):
        sp = qparams[tag]
        if not sp["quant"]:
            return _conv_f32(sp, h)
        hq = jnp.clip(
            jnp.round(h.astype(jnp.float32) * jnp.asarray(sp["inv_sx"])),
            -127, 127,
        ).astype(jnp.int8)
        wq = jnp.asarray(sp["wq"])
        if sp["kind"] == "convT":
            y = lax.conv_transpose(
                hq, wq, (1, 1), "SAME", dimension_numbers=DN,
                transpose_kernel=False, preferred_element_type=jnp.int32,
            )
        else:
            groups = wq.shape[-1] if sp["kind"] == "dw" else 1
            y = lax.conv_general_dilated(
                hq, wq, (sp["stride"],) * 2, "SAME",
                feature_group_count=groups, dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
        y = y.astype(jnp.float32) * jnp.asarray(sp["eff"]) + jnp.asarray(sp["b"])
        return y.astype(float_dtype)

    return _structure(
        x.astype(float_dtype), conv, qparams["_n"]["down"], qparams["_n"]["up"]
    )


# ---------------------------------------------------------------------------
# Public entry + scale persistence
# ---------------------------------------------------------------------------


def scales_path_for(checkpoint_file) -> Path:
    return Path(str(checkpoint_file) + ".quant.json")


def load_scales(path) -> Optional[Dict[str, np.ndarray]]:
    path = Path(path)
    if not path.is_file():
        return None
    with open(path) as fp:
        return {
            k: np.asarray(v, np.float32)
            for k, v in json.load(fp).items()
            if not k.startswith("_")
        }


def save_scales(path, scales: Dict[str, np.ndarray], extra: Optional[dict] = None) -> None:
    doc = {k: np.asarray(v).tolist() for k, v in scales.items()}
    if extra:
        doc.update(extra)
    with open(path, "w") as fp:
        json.dump(doc, fp, indent=1, sort_keys=True)


def _ckpt_fingerprint(checkpoint_file) -> dict:
    """Content-stable checkpoint identity (canonical implementation lives
    in core/aot_cache.py, shared with the AOT executable cache; the JSON
    sidecar layout written by earlier rounds is unchanged)."""
    from tmat_tpu.core.aot_cache import ckpt_fingerprint

    return ckpt_fingerprint(checkpoint_file)


def load_scales_for(checkpoint_file) -> Optional[Dict[str, np.ndarray]]:
    """Sidecar scales, but ONLY if they were calibrated against the current
    checkpoint bytes: activation scales depend on the weights, and a
    retrained/overwritten checkpoint must trigger recalibration, not a
    silent reuse of stale scales."""
    path = scales_path_for(checkpoint_file)
    if not path.is_file():
        return None
    with open(path) as fp:
        doc = json.load(fp)
    if doc.get("_ckpt") != _ckpt_fingerprint(checkpoint_file):
        return None
    return {
        k: np.asarray(v, np.float32)
        for k, v in doc.items()
        if not k.startswith("_")
    }


def save_scales_for(checkpoint_file, scales: Dict[str, np.ndarray]) -> None:
    save_scales(
        scales_path_for(checkpoint_file), scales,
        extra={"_ckpt": _ckpt_fingerprint(checkpoint_file)},
    )


def make_quant_pred_fn(
    variables,
    filter_counts: Sequence[int],
    scales: Optional[Dict[str, float]] = None,
    calib_batch: Optional[np.ndarray] = None,
    patch_size: int = 320,
    quantize_depthwise: bool = True,
    float_dtype=jnp.bfloat16,
    mode: str = "mixed",
) -> Tuple[Callable, Dict[str, float]]:
    """Build the quantized pred_fn for the tiled pipeline.

    Scales resolution: explicit ``scales`` > calibration on ``calib_batch``
    > calibration on the default synthetic batch.

    ``mode``: "mixed" (bf16 storage, int8 at the compute-bound up-block
    convs — the only variant that measured >= 1x vs bf16 on v5e) or
    "int8" (the full integer-domain graph; 0.84x measured, kept for
    runtimes where integer convs can emit narrow types).
    """
    folded = extract_folded(variables, filter_counts)
    if scales is None:
        if calib_batch is None:
            calib_batch = default_calibration_batch(patch_size)
        scales = calibrate(folded, calib_batch)
    if mode == "mixed":
        qparams = quantize_mixed(folded, scales)

        def pred_fn(batch):
            return forward_mixed(qparams, batch, float_dtype=float_dtype)

    else:
        qparams = quantize_folded(
            folded, scales, quantize_depthwise=quantize_depthwise
        )

        def pred_fn(batch):
            return forward_quant(qparams, batch, float_dtype=float_dtype)

    return pred_fn, scales
