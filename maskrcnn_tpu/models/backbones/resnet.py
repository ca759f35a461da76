"""ResNet-50 bottom-up backbone, NHWC, flax.linen.

Behavioral spec: chainer ``ResNet50Layers`` as consumed by the reference FPN
(reference chainer_maskrcnn/model/extractor/feature_pyramid_network.py:22,46-53)
and C4 backbone (c4_backbone.py:7-26):

- caffe-style bottlenecks: the downsampling stride sits on the FIRST 1×1 conv
  of each stage's first block (chainer resnet convention), not the 3×3 —
  preserved so a chainer-npz weight conversion is exact.
- stem: 7×7/2 conv → BN → relu → 2×2/2 max-pool (the reference pools with
  ksize 2, not the canonical 3×3/2 — feature_pyramid_network.py:48).
- ``freeze_bn``: BatchNorm always uses running statistics (the reference
  freezes BN for C4 via disable_update, c4_backbone.py:13-15; we default to
  frozen everywhere, the standard detection practice for small batches).

TPU notes: NHWC layout + channels padded to MXU-friendly multiples by
construction (64/256/512/1024/2048); conv compute in ``dtype`` (bfloat16 for
speed), params and BN stats in float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class StemConv(nn.Module):
    """The 7×7/2 stem conv, computed in space-to-depth form.

    XLA:TPU lowers the direct conv on a 3-channel input by padding channels
    up to the MXU lane width — measured ~6–8 ms fwd at (8, 800, 1024, 3)
    bf16 on a v5e for a conv whose ideal cost is <0.5 ms. Rewriting it over
    a 2×2 space-to-depth input (H/2, W/2, 12 channels) with the kernel
    zero-padded 7→8 and rearranged to (4, 4, 12, 64) computes the exact
    same sums (plus zero taps) ~3× faster.

    The parameter tree is IDENTICAL to the direct ``nn.Conv``: one
    ``kernel`` of shape (7, 7, 3, features) — the rearrangement happens at
    trace time — so chainer-npz weight conversion and existing checkpoints
    are untouched. Derivation: output y[i,j] sums x[2i+p−3, 2j+q−3] w[p,q];
    with X[I,J,(a,b)] = x[2I+a, 2J+b] and p = 2P+a−1 the same sum is a
    stride-1 4×4 conv over X with padding ((2,1),(2,1)).
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, self.features)
        )
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0 and c == 3, (h, w, c)
        dt = self.dtype
        xs = x.astype(dt).reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # zero-pad the kernel so p+1 = 2P+a spans p ∈ [-1, 7)
        kp = jnp.pad(k.astype(dt), ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, c, self.features)      # (P, a, Q, b, C, O)
        kp = kp.transpose(0, 2, 1, 3, 4, 5)                # (P, Q, a, b, C, O)
        kp = kp.reshape(4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            xs, kp, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Norm(nn.Module):
    """BatchNorm that can be frozen (inference statistics always)."""

    frozen: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from maskrcnn_tpu.ops.roi_align import current_spmd_axis

        use_running = self.frozen or not train
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=0.9,
            # chainer L.BatchNormalization default (2e-5) — kept so converted
            # reference/ImageNet weights reproduce the reference numerics.
            epsilon=2e-5,
            dtype=self.dtype,
            # sync-BN: inside a shard_map DP body (trace-time marker) batch
            # statistics pmean over the mesh axis, so trainable BN matches
            # the global-batch stats GSPMD/single-device compute. Frozen or
            # eval BN never reduces (running stats only).
            axis_name=None if use_running else current_spmd_axis(),
        )(x)


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        dt = self.dtype
        # caffe/chainer-style: stride on the first 1x1.
        h = nn.Conv(self.mid, (1, 1), strides=self.stride, use_bias=False, dtype=dt)(x)
        h = Norm(self.frozen_bn, dt)(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False, dtype=dt)(h)
        h = Norm(self.frozen_bn, dt)(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.out, (1, 1), use_bias=False, dtype=dt)(h)
        h = Norm(self.frozen_bn, dt)(h, train)
        if residual.shape[-1] != self.out or self.stride != 1:
            residual = nn.Conv(
                self.out, (1, 1), strides=self.stride, use_bias=False, dtype=dt,
                name="proj",
            )(x)
            residual = Norm(self.frozen_bn, dt, name="proj_bn")(residual, train)
        return nn.relu(h + residual.astype(h.dtype))


class ResStage(nn.Module):
    n_blocks: int
    mid: int
    out: int
    stride: int
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_blocks):
            x = Bottleneck(
                self.mid,
                self.out,
                stride=self.stride if i == 0 else 1,
                frozen_bn=self.frozen_bn,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        return x


class ResNet50(nn.Module):
    """Returns {'c2','c3','c4','c5'} feature maps (strides 4/8/16/32)."""

    frozen_bn: bool = True
    dtype: Any = jnp.float32
    include_c5: bool = True
    # space-to-depth stem (identical params/numerics, ~3× faster on TPU);
    # the direct conv is kept for odd input sizes and as an A/B reference.
    stem_s2d: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            h = StemConv(64, dt, name="conv1")(x)
        else:
            h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=dt, name="conv1")(x.astype(dt))
        h = Norm(self.frozen_bn, dt, name="bn1")(h, train)
        h = nn.relu(h)
        # Reference pools ksize=2 stride=2 (feature_pyramid_network.py:48).
        h = nn.max_pool(h, (2, 2), strides=(2, 2))

        c2 = ResStage(3, 64, 256, 1, self.frozen_bn, dt, name="res2")(h, train)
        c3 = ResStage(4, 128, 512, 2, self.frozen_bn, dt, name="res3")(c2, train)
        c4 = ResStage(6, 256, 1024, 2, self.frozen_bn, dt, name="res4")(c3, train)
        out = {"c2": c2, "c3": c3, "c4": c4}
        if self.include_c5:
            out["c5"] = ResStage(3, 512, 2048, 2, self.frozen_bn, dt,
                                 name="res5")(c4, train)
        return out


class Res5Stage(nn.Module):
    """Standalone res5 with strides forced to 1, for the Res5 ROI head
    (reference model/head/resnet_roi_mask_head.py:25-29,61-65)."""

    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResStage(3, 512, 2048, 1, self.frozen_bn, self.dtype,
                        name="res5")(x, train)
