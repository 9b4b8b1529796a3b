"""PyTorch checkpoint -> flax pytree converter.

Replaces the reference's loading paths (``train_depth.py:798-845``):
  * indoor: a single ``depth.pth.tar`` whose ``state_dict`` holds the full
    ``DispResNet_Indoor`` (keys ``encoder.encoder.*`` / ``decoder.decoder.*``);
  * monodepth2: per-module ``{name}.pth`` files (``encoder.pth`` with extra
    ``height/width/use_stereo`` entries to drop, ``depth.pth`` with decoder
    keys ``decoder.{idx}...``).

The flax modules in this package name their submodules so the mapping is a
mechanical rename:
  conv weights   [O, I, kh, kw] -> kernel [kh, kw, I, O]
  bn weight/bias -> scale/bias;  running_mean/var -> batch_stats mean/var
  decoder ModuleList index: upconv_{i}_{j} -> (4 - i) * 2 + j, dispconv_{s}
  -> 10 + s.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import jax
import numpy as np

_BN_LEAF_MAP = {
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}

_JUNK_KEYS = ("height", "width", "use_stereo")


def _canonicalize(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Normalize torch keys to ``encoder.<torchname>`` / ``decoder.<idx>...``."""
    out: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if key in _JUNK_KEYS or key.endswith("num_batches_tracked"):
            continue
        k = key
        if k.startswith("module."):
            k = k[len("module."):]
        # Full-model checkpoints nest the torchvision net / ModuleList once
        # more (DispResNet_Indoor.encoder.encoder, decoder.decoder).
        if k.startswith("encoder.encoder."):
            k = "encoder." + k[len("encoder.encoder."):]
        elif k.startswith("decoder.decoder."):
            k = "decoder." + k[len("decoder.decoder."):]
        elif re.match(r"^decoder\.\d", k):
            pass  # decoder-only .pth (monodepth2 depth.pth)
        elif re.match(r"^(conv1|bn1|layer\d)\.", k):
            k = "encoder." + k  # bare torchvision state dict
        out[k] = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
    return out


def _torch_key(path: Tuple[str, ...], collection: str) -> str:
    """Map a flax param path to the canonical torch key."""
    parts = list(path)
    leaf = parts[-1]

    if parts[0] == "encoder":
        segs = parts[1:-1]
        torch_segs = []
        for seg in segs:
            m = re.fullmatch(r"layer(\d)_(\d+)", seg)
            if m:
                torch_segs.append(f"layer{m.group(1)}.{m.group(2)}")
            elif seg == "downsample_conv":
                torch_segs.append("downsample.0")
            elif seg == "downsample_bn":
                torch_segs.append("downsample.1")
            else:
                torch_segs.append(seg)
        if collection == "batch_stats" or leaf in ("scale",):
            suffix = _BN_LEAF_MAP[leaf]
        elif leaf == "kernel":
            suffix = "weight"
        elif leaf == "bias":
            # bias of a BatchNorm vs a Conv: resnet convs have no bias, so a
            # bias leaf under encoder is always batch-norm.
            suffix = "bias"
        else:
            raise KeyError(f"unexpected leaf {leaf} at {path}")
        return "encoder." + ".".join(torch_segs) + "." + suffix

    if parts[0] == "decoder":
        seg = parts[1]
        m = re.fullmatch(r"upconv_(\d)_(\d)", seg)
        if m:
            idx = (4 - int(m.group(1))) * 2 + int(m.group(2))
            mid = "conv.conv"
        else:
            m = re.fullmatch(r"dispconv_(\d)", seg)
            if not m:
                raise KeyError(f"unexpected decoder module {seg}")
            idx = 10 + int(m.group(1))
            mid = "conv"
        suffix = "weight" if leaf == "kernel" else "bias"
        return f"decoder.{idx}.{mid}.{suffix}"

    raise KeyError(f"unexpected top-level module {parts[0]}")


def _convert_leaf(value: np.ndarray, leaf_name: str, target_shape) -> np.ndarray:
    if leaf_name == "kernel":
        value = np.transpose(value, (2, 3, 1, 0))
        # Multi-image stem: replicate single-image conv1 weights across the
        # stacked input channels and renormalize (reference
        # ``resnet_multiimage_input``, networks.py:101).
        tin, vin = target_shape[2], value.shape[2]
        if tin != vin and tin % vin == 0 and value.shape[:2] == tuple(target_shape[:2]):
            n = tin // vin
            value = np.concatenate([value] * n, axis=2) / n
    if tuple(value.shape) != tuple(target_shape):
        raise ValueError(
            f"shape mismatch converting leaf: torch {value.shape} vs flax {tuple(target_shape)}"
        )
    return value.astype(np.float32)


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    params,
    batch_stats,
    *,
    strict: bool = True,
    expect_full: bool = False,
):
    """Fill flax ``params`` / ``batch_stats`` pytrees from a torch state dict.

    Leaves with no matching torch key keep their initialized values when
    ``strict=False`` (partial merge, as the reference's ``load_model`` does
    for per-module checkpoints); with ``strict=True`` a miss is an error.

    Non-strict loads are guarded against SILENT no-ops: if the state dict
    matches zero model leaves (wrong/corrupt file — the run would proceed on
    random init and produce garbage depth) a warning is emitted; with
    ``expect_full=True`` (full-model checkpoints, e.g. the indoor
    ``depth.pth.tar``) any missed leaf warns with a sample of the paths.
    """
    import warnings

    torch_sd = _canonicalize(state_dict)
    used = set()
    missed_paths = []
    matched = [0]

    def fill(tree, collection):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        treedef = jax.tree_util.tree_structure(tree)
        new_leaves = []
        for keypath, leaf in flat:
            path = tuple(
                k.key if hasattr(k, "key") else str(k) for k in keypath
            )
            try:
                tkey = _torch_key(path, collection)
            except KeyError:
                if strict:
                    raise
                missed_paths.append(path)
                new_leaves.append(leaf)
                continue
            if tkey in torch_sd:
                used.add(tkey)
                matched[0] += 1
                new_leaves.append(
                    _convert_leaf(torch_sd[tkey], path[-1], leaf.shape)
                )
            else:
                if strict:
                    raise KeyError(f"missing torch key {tkey} for flax path {path}")
                missed_paths.append(path)
                new_leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    new_params = fill(params, "params")
    new_stats = fill(batch_stats, "batch_stats") if batch_stats else batch_stats

    if strict:
        unused = set(torch_sd) - used
        if unused:
            raise KeyError(f"unconsumed torch keys: {sorted(unused)[:8]} ...")
    elif matched[0] == 0 and torch_sd:
        warnings.warn(
            "checkpoint matched 0 model leaves (of "
            f"{len(missed_paths)}); the model stays at its random "
            "initialization — wrong or corrupt checkpoint file?"
        )
    elif expect_full and missed_paths:
        sample = ["/".join(p) for p in missed_paths[:5]]
        warnings.warn(
            f"full-model checkpoint left {len(missed_paths)} leaves at "
            f"initialization (e.g. {sample}); the file may be stale or "
            "from a different architecture"
        )
    return new_params, new_stats


def load_torch_checkpoint(path: str, params, batch_stats, *, strict: bool = False,
                          expect_full: bool = False):
    """Load a ``.pth`` / ``.pth.tar`` file and convert it (needs torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return convert_torch_state_dict(
        ckpt, params, batch_stats, strict=strict, expect_full=expect_full
    )


def load_monodepth2_modules(
    dirpath: str,
    params,
    batch_stats,
    models_to_load=("encoder", "depth"),
):
    """Per-module monodepth2 loading: merge ``{name}.pth`` files in sequence.

    Reference semantics (``train_depth.py:798-822``): for each module name,
    load ``{path}/{name}.pth``, intersect with the model's own keys, and
    update — a partial state-dict merge. Files are allowed to carry junk
    metadata keys (monodepth2's encoder.pth stores height/width/use_stereo);
    ``_canonicalize`` drops them.
    """
    import os

    for name in models_to_load:
        path = os.path.join(dirpath, f"{name}.pth")
        params, batch_stats = load_torch_checkpoint(
            path, params, batch_stats, strict=False
        )
    return params, batch_stats


def load_imagenet_encoder(path: str, params, batch_stats):
    """Initialize the encoder from a torchvision-format ImageNet state dict.

    The reference downloads torchvision weights via ``model_zoo``
    (``depth_estimation/networks.py:34-47,96-104``); in an air-gapped TPU
    environment the converted weights must live on disk. ``path`` points at
    a ``.pth`` holding a bare torchvision ResNet state dict (keys
    ``conv1.weight``, ``layer1.0...`` — ``_canonicalize`` prefixes them with
    ``encoder.``). Decoder leaves keep their initialization; the multi-image
    stem replication/renormalization is applied automatically.
    """
    return load_torch_checkpoint(path, params, batch_stats, strict=False)


def load_depth_weights(config, params, batch_stats):
    """The single checkpoint-loading entry point for every driver app.

    Order mirrors the reference: ImageNet encoder init at construction
    (``MODEL.weights_init_encoder: imagenet`` + ``MODEL.imagenet_weights_path``),
    then task checkpoints override (``MODEL.use_pretrained_models`` +
    ``MODEL.load_depth_path``: indoor ``depth.pth.tar``
    [``train_depth.py:824-845``] or monodepth2 per-module ``{name}.pth``
    [``train_depth.py:798-822``], chosen by ``MODEL.depth_network``).
    """
    import os

    M = config.MODEL
    if str(M.get("weights_init_encoder") or "").lower() == "imagenet":
        path = M.get("imagenet_weights_path")
        if not path:
            raise ValueError(
                "MODEL.weights_init_encoder: imagenet requires "
                "MODEL.imagenet_weights_path (a torchvision ResNet state "
                "dict on disk; this environment cannot download model_zoo "
                "weights)"
            )
        params, batch_stats = load_imagenet_encoder(path, params, batch_stats)

    if M.get("use_pretrained_models") and M.get("load_depth_path"):
        if str(M.get("depth_network", "indoor")) == "indoor":
            # A full-model checkpoint (reference train_depth.py:824-845);
            # expect_full makes any unmatched leaf warn instead of the
            # torch-strict raise (legit exports may omit BN num_batches).
            params, batch_stats = load_torch_checkpoint(
                os.path.join(M.load_depth_path, "depth.pth.tar"),
                params, batch_stats, expect_full=True,
            )
        else:
            # Precedence: an EXPLICIT MODEL.models_to_load wins (it is only
            # ever set deliberately), then the reference's documented
            # MODEL.pretrained_models_list (train_depth.py:815-817 — the
            # shipped config's [depth_encoder, depth_decoder] matches the
            # reference's own monodepth2 training dumps), then the
            # monodepth2-release file names.
            names = tuple(
                M.get("models_to_load")
                or M.get("pretrained_models_list")
                or ("encoder", "depth")
            )
            params, batch_stats = load_monodepth2_modules(
                M.load_depth_path, params, batch_stats, models_to_load=names
            )
    return params, batch_stats
