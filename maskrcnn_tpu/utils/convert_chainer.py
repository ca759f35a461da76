"""Chainer npz → flax pytree weight converter.

Spec: the reference backbone loads ImageNet-pretrained chainer
``ResNet50Layers('auto')`` weights (reference feature_pyramid_network.py:22,
c4_backbone.py:9) and publishes a Light-Head checkpoint as npz
(README.md:57-62). This converter maps those npz trees onto this framework's
flax parameter layout so pretrained-parity experiments are possible
(SURVEY §7 hard-part 5).

Layout conversions:
- chainer Convolution2D ``W`` is (O, I, kH, kW) → flax kernel (kH, kW, I, O),
- chainer Linear ``W`` is (out, in) → flax kernel (in, out); when the linear
  consumed a flattened NCHW conv map, the input dim is additionally permuted
  CHW → HWC to match this framework's NHWC flatten order,
- BatchNormalization gamma/beta/avg_mean/avg_var →
  BatchNorm scale/bias (params) + mean/var (batch_stats).

chainer ResNet block naming: stage ``res{k}`` has block ``a`` (with
projection conv4/bn4) and blocks ``b1..bN`` → our ``res{k}/block{i}`` with
``Conv_0..2`` + ``proj``.
"""

from __future__ import annotations

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray, chw: tuple[int, int, int] | None = None) -> np.ndarray:
    # chainer (out, in) → flax (in, out); optionally re-order the flattened
    # input from CHW to HWC.
    if chw is not None:
        c, h, wd = chw
        out = w.shape[0]
        w = w.reshape(out, c, h, wd).transpose(0, 2, 3, 1).reshape(out, -1)
    return w.T


def convert_resnet50_npz(npz: dict, prefix: str = "") -> tuple[dict, dict]:
    """Convert a chainer ResNet50Layers npz → (params, batch_stats) subtrees
    matching ``maskrcnn_tpu.models.backbones.resnet.ResNet50``."""
    params: dict = {}
    stats: dict = {}

    def get(name):
        return npz[prefix + name]

    def put_bn(pdst: dict, sdst: dict, cname: str):
        pdst["BatchNorm_0"] = {
            "scale": get(f"{cname}/gamma"),
            "bias": get(f"{cname}/beta"),
        }
        sdst["BatchNorm_0"] = {
            "mean": get(f"{cname}/avg_mean"),
            "var": get(f"{cname}/avg_var"),
        }

    params["conv1"] = {"kernel": _conv(get("conv1/W"))}
    params["bn1"], stats["bn1"] = {}, {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    stage_blocks = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
    for stage, n in stage_blocks.items():
        if f"{prefix}{stage}/a/conv1/W" not in npz:
            continue  # truncated models (C4) lack res5
        sp, ss = {}, {}
        for i in range(n):
            cname = "a" if i == 0 else f"b{i}"
            bp, bs = {}, {}
            for j in range(3):
                bp[f"Conv_{j}"] = {"kernel": _conv(get(f"{stage}/{cname}/conv{j + 1}/W"))}
                bp[f"Norm_{j}"], bs[f"Norm_{j}"] = {}, {}
                put_bn(bp[f"Norm_{j}"], bs[f"Norm_{j}"], f"{stage}/{cname}/bn{j + 1}")
            if i == 0:
                bp["proj"] = {"kernel": _conv(get(f"{stage}/a/conv4/W"))}
                bp["proj_bn"], bs["proj_bn"] = {}, {}
                put_bn(bp["proj_bn"], bs["proj_bn"], f"{stage}/a/bn4")
            sp[f"block{i}"] = bp
            ss[f"block{i}"] = bs
        params[stage] = sp
        stats[stage] = ss
    return params, stats


def load_npz(path: str) -> dict:
    return dict(np.load(path, allow_pickle=False))


def tree_shapes_match(converted: dict, target: dict, path="") -> list[str]:
    """Return a list of mismatch descriptions (empty = exact match)."""
    errs = []
    keys_c, keys_t = set(converted), set(target)
    for k in keys_c - keys_t:
        errs.append(f"{path}/{k}: unexpected in converted")
    for k in keys_t - keys_c:
        errs.append(f"{path}/{k}: missing from converted")
    for k in keys_c & keys_t:
        c, t = converted[k], target[k]
        if isinstance(t, dict):
            errs.extend(tree_shapes_match(c, t, f"{path}/{k}"))
        else:
            if tuple(np.shape(c)) != tuple(np.shape(t)):
                errs.append(
                    f"{path}/{k}: shape {np.shape(c)} vs {np.shape(t)}"
                )
    return errs
