"""Functional NN core.

Models in this framework are pure functions over flat parameter dicts whose
keys mirror the reference torch ``state_dict`` names (e.g.
``"stage2.0.branches.0.1.conv1.weight"``) so checkpoints convert 1:1
(ref: model/checkpoints.py, model/OTPose.py:477-496).  Conv kernels are
stored TPU-native as HWIO (2-D) / WIO (1-D); the torch importer transposes
from OIHW once at load time.

``Ctx`` threads params / batch-norm state / rng / train flag / compute dtype
through a forward pass and collects updated running stats, keeping model code
close to the math while staying jit-friendly (Ctx only exists at trace time).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

BN_MOMENTUM = 0.1  # torch semantics: running = (1-m)*running + m*batch
BN_EPS = 1e-5
LN_EPS = 1e-5


class Ctx:
    """Scoped view over flat param/state dicts for one forward pass."""

    def __init__(self, params: Params, state: Params, *, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 compute_dtype: jnp.dtype = jnp.float32,
                 sync_axis: Optional[str] = None,
                 seq_axis: Optional[str] = None,
                 fused: Optional[bool] = None,
                 prefix: str = "", root: Optional["Ctx"] = None):
        self.params = params
        self.state = state
        self.train = train
        self.compute_dtype = compute_dtype
        self.sync_axis = sync_axis
        # mesh axis name to shard the conv-transformer token dimension over
        # (sequence parallelism for the T=6912 grids; None = data-parallel
        # only).  Requires an active jax.sharding.set_mesh context.
        self.seq_axis = seq_axis
        # Pallas fused-MLP kernel for the conv-transformer blocks (eval path
        # only; training keeps plain jnp ops for autodiff).  Auto: on for a
        # single real TPU device — under a multi-device mesh the GSPMD
        # partitioner has no sharding rule for the custom call, so the XLA
        # path is kept there.  Tests force True to run the kernel
        # interpreted on CPU.
        if fused is None:
            fused = (jax.default_backend() == "tpu"
                     and jax.device_count() == 1)
        self.fused = bool(fused) and not train
        self._prefix = prefix
        if root is None:
            self.new_state: Params = {}
            self._rng = rng
            self._rng_count = [0]
            self._root = self
        else:
            self._root = root

    # -- scoping -----------------------------------------------------------
    def sub(self, name: str) -> "Ctx":
        child = Ctx.__new__(Ctx)
        child.params = self.params
        child.state = self.state
        child.train = self.train
        child.compute_dtype = self.compute_dtype
        child.sync_axis = self.sync_axis
        child.seq_axis = self.seq_axis
        child.fused = self.fused
        child._prefix = self._key(name) + "."
        child._root = self._root
        return child

    def frozen(self) -> "Ctx":
        """Eval-mode view of this scope: batch norm normalizes with running
        stats and records no updates.  Used for frozen submodules
        (MODEL.FREEZE_HRNET_WEIGHTS)."""
        child = Ctx.__new__(Ctx)
        child.params = self.params
        child.state = self.state
        child.train = False
        child.compute_dtype = self.compute_dtype
        child.sync_axis = self.sync_axis
        child.seq_axis = self.seq_axis
        child.fused = self.fused
        child._prefix = self._prefix
        child._root = self._root
        return child

    def _key(self, name: str) -> str:
        return self._prefix + name

    def param(self, name: str) -> jnp.ndarray:
        return self.params[self._key(name)]

    def has(self, name: str) -> bool:
        return self._key(name) in self.params

    def next_rng(self) -> jax.Array:
        root = self._root
        if root._rng is None:
            raise ValueError("Ctx has no rng but a stochastic layer was called in train mode")
        key = jax.random.fold_in(root._rng, root._rng_count[0])
        root._rng_count[0] += 1
        return key

    # -- layers ------------------------------------------------------------
    def conv2d(self, name: str, x: jnp.ndarray, *, stride: int = 1, padding: int = 0,
               dilation: int = 1, groups: int = 1, bias: Optional[bool] = None) -> jnp.ndarray:
        w = self.param(f"{name}.weight")
        b = self.params.get(self._key(f"{name}.bias")) if bias is not False else None
        return conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation,
                      groups=groups, compute_dtype=self.compute_dtype)

    def conv1d(self, name: str, x: jnp.ndarray, *, stride: int = 1, padding: int = 0,
               groups: int = 1) -> jnp.ndarray:
        w = self.param(f"{name}.weight")
        b = self.params.get(self._key(f"{name}.bias"))
        if groups == x.shape[-1] and w.shape[0] == 3 and padding == 1:
            # depthwise k=3: XLA's grouped-conv lowering is slow on TPU; three
            # shifted elementwise multiply-adds hit the VPU directly
            return depthwise_conv1d_k3(x, w, b, stride=stride)
        return conv1d(x, w, b, stride=stride, padding=padding, groups=groups,
                      compute_dtype=self.compute_dtype)

    def batch_norm(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        key = self._key(name)
        y, new_mean, new_var = batch_norm(
            x,
            self.param(f"{name}.weight"),
            self.param(f"{name}.bias"),
            self.state[f"{key}.running_mean"],
            self.state[f"{key}.running_var"],
            train=self.train,
            sync_axis=self.sync_axis,
        )
        if self.train:
            self._root.new_state[f"{key}.running_mean"] = new_mean
            self._root.new_state[f"{key}.running_var"] = new_var
        return y

    def layer_norm_c(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        """Channel LayerNorm over the last axis of (B, T, C) (ref: blocks.py:67-110)."""
        return layer_norm_c(x, self.param(f"{name}.weight"), self.param(f"{name}.bias"))

    def layer_norm_ct(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        """Channel LayerNorm over axis 1 of (B, C, T)."""
        return layer_norm_ct(x, self.param(f"{name}.weight"), self.param(f"{name}.bias"))

    def dropout(self, x: jnp.ndarray, rate: float) -> jnp.ndarray:
        if not self.train or rate <= 0.0:
            return x
        keep = 1.0 - rate
        # probed alternatives (tools/time_train_step.py --ab-dropout +
        # /tmp rng microbench, STATUS.md round-2 perf log): uint16 threefry
        # bits halve the random bytes but measured identical (9.0 vs 9.2 ms
        # for all 42 flagship sites) — generation is not the binding cost,
        # so the canonical bernoulli form stays
        mask = jax.random.bernoulli(self.next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    def drop_path(self, x: jnp.ndarray, rate: float) -> jnp.ndarray:
        """Per-sample stochastic depth (ref: blocks.py:303-316)."""
        if not self.train or rate <= 0.0:
            return x
        keep = 1.0 - rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(self.next_rng(), shape, x.dtype))
        return x / keep * mask

    def finalize_state(self) -> Params:
        """Merged state dict after a train-mode pass."""
        out = dict(self.state)
        out.update(self._root.new_state)
        return out


# ---------------------------------------------------------------------------
# primitives (NHWC activations; HWIO / WIO kernels)
# ---------------------------------------------------------------------------

def _mxu_precision(compute_dtype) -> jax.lax.Precision:
    """f32 compute requests exact (3-pass) MXU math; bf16 uses the fast path."""
    return (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _preferred(compute_dtype):
    """Accumulation/output dtype for matmuls.  The MXU always accumulates in
    f32 internally; requesting an f32 *output* from bf16 operands breaks the
    conv/einsum transpose rules under jax.grad (dtype-mismatched VJP), so the
    output follows the compute dtype."""
    return jnp.float32 if compute_dtype == jnp.float32 else compute_dtype


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None, *,
           stride: int = 1, padding: int = 0, dilation: int = 1, groups: int = 1,
           compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """2-D conv on NHWC with HWIO kernel; f32 accumulation on the MXU."""
    orig_dtype = x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_preferred(compute_dtype),
        precision=_mxu_precision(compute_dtype),
    ).astype(orig_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None, *,
           stride: int = 1, padding: int = 0, groups: int = 1,
           compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """1-D conv on (B, T, C) with (K, I/groups, O) kernel."""
    orig_dtype = x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=_preferred(compute_dtype),
        precision=_mxu_precision(compute_dtype),
    ).astype(orig_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv1d_k3(x: jnp.ndarray, w: jnp.ndarray,
                        b: Optional[jnp.ndarray] = None, *,
                        stride: int = 1) -> jnp.ndarray:
    """Depthwise 1-D conv, kernel 3, padding 1, on (B, T, C) with (3, 1, C)
    kernel — as shifted elementwise multiply-adds (VPU) instead of XLA's slow
    grouped-conv lowering."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    t = x.shape[1]
    w = w.astype(x.dtype)
    if stride == 1:
        y = (xp[:, 0:t] * w[0, 0] + xp[:, 1:t + 1] * w[1, 0]
             + xp[:, 2:t + 2] * w[2, 0])
    else:
        to = (t + 2 - 3) // stride + 1
        end = (to - 1) * stride + 1
        y = (xp[:, 0:end:stride][:, :to] * w[0, 0]
             + xp[:, 1:end + 1:stride][:, :to] * w[1, 0]
             + xp[:, 2:end + 2:stride][:, :to] * w[2, 0])
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               running_mean: jnp.ndarray, running_var: jnp.ndarray, *,
               train: bool, momentum: float = BN_MOMENTUM, eps: float = BN_EPS,
               sync_axis: Optional[str] = None):
    """Torch-semantics batch norm over the channel (last) axis.

    Training normalizes with biased batch variance and updates running stats
    with the unbiased variance; eval normalizes with running stats
    (matches nn.BatchNorm2d(momentum=0.1)).  ``sync_axis`` enables
    cross-replica statistics via psum (sync-BN over the data mesh axis).
    """
    if not train:
        # eval: running stats are constants, so fold them into a per-channel
        # affine computed in f32 and applied in the activation dtype — the
        # f32-upcast normalize costs a full extra HBM pass per BN (measured
        # 2.5 ms across HRNet's ~270 BNs at batch 16; the affine form
        # recovers 2.25 ms and XLA fuses it into the conv epilogue)
        inv = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
        scale = weight.astype(jnp.float32) * inv
        shift = bias.astype(jnp.float32) - running_mean.astype(jnp.float32) * scale
        y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        return y, running_mean, running_var

    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)  # statistics in f32 even for bf16 activations
    n = np.prod([x.shape[a] for a in reduce_axes])
    mean = jnp.mean(xf, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
    if sync_axis is not None:
        mean = jax.lax.pmean(mean, sync_axis)
        mean_sq = jax.lax.pmean(mean_sq, sync_axis)
        n = n * jax.lax.psum(1, sync_axis)
    var = mean_sq - jnp.square(mean)
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * (inv * weight) + bias
    return y.astype(x.dtype), new_mean, new_var


def batch_norm_multi(ctx: "Ctx", names, chs, x: jnp.ndarray) -> jnp.ndarray:
    """Batch norm over the channel-concatenated outputs of several BN layers.

    Per-channel statistics make BN exactly separable over channel groups, so
    concatenating the params/state of ``names`` and normalizing once is
    bit-equivalent to normalizing each group with its own layer — but it is
    ONE kernel instead of len(names) (each small kernel costs ~0.03-0.4 ms
    of launch/latency on v5e; see STATUS.md perf log).  Train-mode running-
    stat updates are split back to the original state keys.
    """
    cat = lambda leaf, src: jnp.concatenate(  # noqa: E731
        [src[ctx._key(f"{n}.{leaf}")] for n in names])
    y, new_mean, new_var = batch_norm(
        x, cat("weight", ctx.params), cat("bias", ctx.params),
        cat("running_mean", ctx.state), cat("running_var", ctx.state),
        train=ctx.train, sync_axis=ctx.sync_axis)
    if ctx.train:
        off = 0
        for n, ch in zip(names, chs):
            ctx._root.new_state[ctx._key(f"{n}.running_mean")] = \
                new_mean[off:off + ch]
            ctx._root.new_state[ctx._key(f"{n}.running_var")] = \
                new_var[off:off + ch]
            off += ch
    return y


def layer_norm_c(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                 eps: float = LN_EPS) -> jnp.ndarray:
    """Channel layer norm with biased variance (ref: blocks.py:95-110).

    x: (B, T, C) normalized over C.  weight/bias: (C,).
    """
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    res = xf - mu
    sigma = jnp.mean(jnp.square(res), axis=-1, keepdims=True)
    out = res / jnp.sqrt(sigma + eps)
    return (out * weight + bias).astype(x.dtype)


def layer_norm_ct(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                  eps: float = LN_EPS) -> jnp.ndarray:
    """``layer_norm_c`` on (B, C, T): normalized over the channel axis 1."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    res = xf - mu
    sigma = jnp.mean(jnp.square(res), axis=1, keepdims=True)
    out = res / jnp.sqrt(sigma + eps)
    return (out * weight[:, None] + bias[:, None]).astype(x.dtype)


def depthwise_conv1d_k3_ct(x: jnp.ndarray, w: jnp.ndarray,
                           b: Optional[jnp.ndarray] = None, *,
                           stride: int = 1) -> jnp.ndarray:
    """``depthwise_conv1d_k3`` on (B, C, T) with (3, 1, C) kernel: shifted
    multiply-adds along the T (lane) axis."""
    t = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
    w = w.astype(x.dtype)
    w0, w1, w2 = w[0, 0][:, None], w[1, 0][:, None], w[2, 0][:, None]
    if stride == 1:
        y = xp[..., 0:t] * w0 + xp[..., 1:t + 1] * w1 + xp[..., 2:t + 2] * w2
    else:
        to = (t + 2 - 3) // stride + 1
        end = (to - 1) * stride + 1
        y = (xp[..., 0:end:stride][..., :to] * w0
             + xp[..., 1:end + 1:stride][..., :to] * w1
             + xp[..., 2:end + 2:stride][..., :to] * w2)
    if b is not None:
        y = y + b.astype(y.dtype)[:, None]
    return y


def max_pool1d_ct(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """MaxPool over the T (last) axis of (B, C, T) with -inf padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, kernel),
        window_strides=(1, 1, stride),
        padding=((0, 0), (0, 0), (padding, padding)),
    )


def upsample_linear_1d_ct(x: jnp.ndarray, out_t: int) -> jnp.ndarray:
    """``upsample_linear_1d`` on (B, C, T): shifts/blends along the last axis."""
    b, c, t = x.shape
    if out_t == t:
        return x  # identity resample: skip the gather
    if out_t % t == 0 and out_t != t:
        f = out_t // t
        left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
        phases = []
        for k in range(f):
            frac = (2 * k + 1) / (2 * f) - 0.5
            if frac < 0:
                phases.append((-frac) * left + (1 + frac) * x)
            elif frac == 0:
                phases.append(x)
            else:
                phases.append((1 - frac) * x + frac * right)
        out = jnp.stack(phases, axis=-1)                     # (B, C, T, f)
        return out.reshape(b, c, t * f).astype(x.dtype)
    scale = t / out_t
    dst = jnp.arange(out_t, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, t - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    w1 = (src - i0.astype(jnp.float32)).astype(x.dtype)[None, None, :]
    x0 = jnp.take(x, i0, axis=-1)
    x1 = jnp.take(x, i1, axis=-1)
    return x0 * (1 - w1) + x1 * w1


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def max_pool1d(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """MaxPool1d on (B, T, C) with -inf padding (torch semantics)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )


def upsample_nearest_2x(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor spatial upsampling on NHWC (ref: HRNet.py:574-583)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def upsample_linear_1d(x: jnp.ndarray, out_t: int) -> jnp.ndarray:
    """nn.Upsample(mode='linear', align_corners=False) on (B, T, C)
    (ref: ConvVideoTransformer.py:108,179).

    For integer factors this is f shifted blends interleaved — pure
    VPU shifts, no TPU gathers.  Non-integer ratios fall back to a gather.
    """
    b, t, c = x.shape
    if out_t == t:
        return x  # identity resample (src grid == dst grid): skip the gather
    if out_t % t == 0 and out_t != t:
        f = out_t // t
        left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)    # x[i-1], edge clamp
        right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)   # x[i+1], edge clamp
        phases = []
        for k in range(f):
            frac = (2 * k + 1) / (2 * f) - 0.5
            if frac < 0:
                # src = i + frac clamps to 0 at i == 0: left is edge-clamped
                phases.append((-frac) * left + (1 + frac) * x)
            elif frac == 0:
                phases.append(x)
            else:
                phases.append((1 - frac) * x + frac * right)
        out = jnp.stack(phases, axis=2)                          # (B, T, f, C)
        return out.reshape(b, t * f, c).astype(x.dtype)
    scale = t / out_t
    dst = jnp.arange(out_t, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, t - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    w1 = (src - i0.astype(jnp.float32)).astype(x.dtype)[None, :, None]
    x0 = jnp.take(x, i0, axis=1)
    x1 = jnp.take(x, i1, axis=1)
    return x0 * (1 - w1) + x1 * w1


def interpolate_linear_to(x: jnp.ndarray, out_t: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) alias."""
    return upsample_linear_1d(x, out_t)


# ---------------------------------------------------------------------------
# initializers (torch-matching distributions)
# ---------------------------------------------------------------------------

def normal_init(key, shape, std=0.001, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform_conv(key, shape_hwio, a=math.sqrt(5), dtype=jnp.float32):
    """torch default conv init (kaiming_uniform with a=sqrt(5)) for HWIO/WIO kernels."""
    fan_in = int(np.prod(shape_hwio[:-1]))  # K... * I
    gain = math.sqrt(2.0 / (1 + a ** 2))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape_hwio, dtype, -bound, bound)


def conv_bias_uniform(key, fan_in, out_ch, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (out_ch,), dtype, -bound, bound)


class KeyGen:
    """Deterministic key dispenser for init functions."""

    def __init__(self, key: jax.Array):
        self._key = key
        self._n = 0

    def __call__(self) -> jax.Array:
        k = jax.random.fold_in(self._key, self._n)
        self._n += 1
        return k
