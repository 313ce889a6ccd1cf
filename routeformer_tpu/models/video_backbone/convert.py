"""Torch checkpoint -> Flax parameter conversion.

Plays the role of the reference's pretrained-weight plumbing: timm loads
pretrained encoders from the hub (``TimmBackbone.py:41-46``) and InverseForm
has a fuzzy state-dict remapper (``InverseForm.py:94-133``). This
environment is zero-egress, so weights arrive as files; this module maps a
torch ``state_dict`` (or a dict of numpy arrays) onto an NNX module's
parameter tree:

- name-based matching after normalizing separators, with the reference's
  fuzzy fallback (suffix matching when prefixes differ);
- layout transposition: torch Linear (out, in) -> flax (in, out); torch
  Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out); Conv1d
  (out, in, k) -> (k, in, out).
"""

import re
from typing import Dict, Tuple

import numpy as np
from flax import nnx

from routeformer_tpu.utils.logging import get_logger

logger = get_logger("video_backbone.convert")


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor
        return value.detach().cpu().numpy()
    return np.asarray(value)


def _transpose_for_flax(
    torch_array: np.ndarray,
    flax_shape: Tuple[int, ...],
    flax_name: str = "",
):
    """Find the layout transposition matching the flax shape.

    2-D arrays destined for a flax ``kernel`` are ALWAYS transposed (torch
    Linear stores (out, in), flax (in, out)) — an exact-shape match on a
    square matrix would otherwise silently load the untransposed weight.
    Non-kernel 2-D targets (e.g. flax ``embedding``, torch (num, dim) in
    the same layout) match by exact shape.
    """
    a = torch_array
    if a.ndim == 2 and flax_name.endswith("kernel"):
        return a.T if a.T.shape == tuple(flax_shape) else None
    if a.shape == tuple(flax_shape):
        return a
    if a.ndim == 2 and a.T.shape == tuple(flax_shape):  # Linear kernel
        return a.T
    if a.ndim == 4:  # Conv2d OIHW -> HWIO
        cand = a.transpose(2, 3, 1, 0)
        if cand.shape == tuple(flax_shape):
            return cand
    if a.ndim == 3:  # Conv1d OIK -> KIO
        cand = a.transpose(2, 1, 0)
        if cand.shape == tuple(flax_shape):
            return cand
    return None


def load_torch_state_dict(
    module: nnx.Module, state_dict: Dict[str, np.ndarray], fuzzy: bool = True
) -> Tuple[int, int]:
    """Load torch weights into an NNX module in place.

    Returns (n_loaded, n_total_params). Unmatched parameters keep their
    initialization (logged), mirroring the reference's tolerant loader.
    BatchNorm running statistics load too (flax ``mean``/``var`` BatchStats
    <- torch ``running_mean``/``running_var``) — essential for trained
    segmentation trunks used in eval mode.
    """
    flat = nnx.to_flat_state(nnx.state(module, (nnx.Param, nnx.BatchStat)))
    available = {k: _to_numpy(v) for k, v in state_dict.items()}

    def norm(name: str) -> str:
        name = name.replace("/", ".")
        if name.endswith(".kernel"):
            name = name[: -len("kernel")] + "weight"
        if name.endswith(".scale"):
            name = name[: -len("scale")] + "weight"
        if name.endswith(".mean"):
            name = name[: -len("mean")] + "running_mean"
        if name.endswith(".var"):
            name = name[: -len("var")] + "running_var"
        return name

    loaded = 0
    updates = []
    for path, variable in flat:
        flax_name = ".".join(str(p) for p in path)
        want = norm(flax_name)
        candidates = [k for k in available if norm(k) == want]
        if not candidates and fuzzy:
            # suffix match (the reference strips mismatched prefixes)
            candidates = [
                k for k in available
                if norm(k).endswith(want) or want.endswith(norm(k))
            ]
        matched = None
        for cand in candidates:
            arr = _transpose_for_flax(
                available[cand], variable.value.shape, flax_name
            )
            if arr is not None:
                matched = (cand, arr)
                break
        if matched is None:
            logger.info("no checkpoint match for %s %s", flax_name, variable.value.shape)
            continue
        cand, arr = matched
        variable.value = arr.astype(np.asarray(variable.value).dtype)
        available.pop(cand, None)
        loaded += 1
        updates.append((path, variable))

    state = nnx.from_flat_state(flat)
    nnx.update(module, state)
    logger.info("loaded %d/%d params from checkpoint", loaded, len(flat))
    return loaded, len(flat)


def load_timm_vit(backbone, state_dict: Dict[str, np.ndarray]) -> int:
    """Load a timm-style ViT state dict into a (scanned) ``TimmBackbone``.

    timm layout: ``patch_embed.proj.{weight,bias}``, ``pos_embed``,
    ``blocks.{i}.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2``, ``norm``.
    The backbone's blocks are *stacked* (params carry a leading depth axis
    for ``nnx.scan``), so per-layer torch tensors are gathered and stacked.

    Returns the number of parameters loaded.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    depth = backbone.depth
    loaded = 0

    def put(variable, arr):
        nonlocal loaded
        arr = np.asarray(arr)
        assert arr.shape == tuple(variable.shape), (arr.shape, variable.shape)
        variable[...] = arr.astype(np.asarray(variable[...]).dtype)
        loaded += 1

    # patch embed: torch Conv2d OIHW -> flax HWIO
    put(backbone.patch_embed.kernel,
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(backbone.patch_embed.bias, sd["patch_embed.proj.bias"])
    pos = sd["pos_embed"]
    if pos.shape[1] == backbone.pos_embed.shape[1] + 1:
        pos = pos[:, 1:]  # drop the cls token position
    put(backbone.pos_embed, pos)
    put(backbone.norm.scale, sd["norm.weight"])
    put(backbone.norm.bias, sd["norm.bias"])

    def stack(fmt: str, transpose: bool = False):
        arrs = [sd[fmt.format(i)] for i in range(depth)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    blocks = backbone.blocks
    put(blocks.norm1.scale, stack("blocks.{}.norm1.weight"))
    put(blocks.norm1.bias, stack("blocks.{}.norm1.bias"))
    put(blocks.norm2.scale, stack("blocks.{}.norm2.weight"))
    put(blocks.norm2.bias, stack("blocks.{}.norm2.bias"))
    put(blocks.qkv.kernel, stack("blocks.{}.attn.qkv.weight", transpose=True))
    put(blocks.qkv.bias, stack("blocks.{}.attn.qkv.bias"))
    put(blocks.proj.kernel, stack("blocks.{}.attn.proj.weight", transpose=True))
    put(blocks.proj.bias, stack("blocks.{}.attn.proj.bias"))
    put(blocks.fc1.kernel, stack("blocks.{}.mlp.fc1.weight", transpose=True))
    put(blocks.fc1.bias, stack("blocks.{}.mlp.fc1.bias"))
    put(blocks.fc2.kernel, stack("blocks.{}.mlp.fc2.weight", transpose=True))
    put(blocks.fc2.bias, stack("blocks.{}.mlp.fc2.bias"))

    logger.info("loaded %d ViT params (depth %d)", loaded, depth)
    return loaded


def load_timm_swin(backbone, state_dict: Dict[str, np.ndarray]) -> int:
    """Load a timm-style SwinV2 state dict into a ``SwinV2Backbone``.

    timm layout: ``patch_embed.proj/norm``, per stage
    ``layers.{s}.blocks.{b}.{norm1,norm2,attn.qkv,attn.q_bias,attn.v_bias,
    attn.logit_scale,attn.cpb_mlp.{0,2},attn.proj,mlp.fc1,mlp.fc2}``,
    ``layers.{s}.downsample.{reduction,norm}`` and a final ``norm``.

    The backbone's blocks are stacked W-MSA/SW-MSA *pairs* (leading n_pairs
    axis for ``nnx.scan``): timm block ``2p`` -> ``pairs.block_a[p]``, block
    ``2p+1`` -> ``pairs.block_b[p]``.

    Patch-merging layout note: this build flattens each 2x2 patch group in
    (dh, dw) row-major order, timm/MSFT concat [x0, x1, x2, x3] =
    [(0,0), (1,0), (0,1), (1,1)] — the reduction kernel's input groups are
    permuted [0, 2, 1, 3] to compensate.

    Returns the number of parameters loaded.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    loaded = 0

    def put(variable, arr):
        nonlocal loaded
        arr = np.asarray(arr)
        assert arr.shape == tuple(variable.shape), (arr.shape, variable.shape)
        variable[...] = arr.astype(np.asarray(variable[...]).dtype)
        loaded += 1

    put(backbone.patch_embed.kernel,
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(backbone.patch_embed.bias, sd["patch_embed.proj.bias"])
    put(backbone.patch_norm.scale, sd["patch_embed.norm.weight"])
    put(backbone.patch_norm.bias, sd["patch_embed.norm.bias"])
    put(backbone.final_norm.scale, sd["norm.weight"])
    put(backbone.final_norm.bias, sd["norm.bias"])

    for si, stage in enumerate(backbone.stages):
        pairs = stage.pairs
        for half, block in (("a", pairs.block_a), ("b", pairs.block_b)):
            offset = 0 if half == "a" else 1

            def stack(fmt: str, transpose: bool = False):
                arrs = [
                    sd[f"layers.{si}.blocks.{2 * p + offset}.{fmt}"]
                    for p in range(stage.n_pairs)
                ]
                if transpose:
                    arrs = [a.T for a in arrs]
                return np.stack(arrs)

            put(block.norm1.scale, stack("norm1.weight"))
            put(block.norm1.bias, stack("norm1.bias"))
            put(block.norm2.scale, stack("norm2.weight"))
            put(block.norm2.bias, stack("norm2.bias"))
            attn = block.attn
            put(attn.qkv.kernel, stack("attn.qkv.weight", transpose=True))
            put(attn.q_bias, stack("attn.q_bias"))
            put(attn.v_bias, stack("attn.v_bias"))
            put(attn.logit_scale, stack("attn.logit_scale"))
            put(attn.proj.kernel, stack("attn.proj.weight", transpose=True))
            put(attn.proj.bias, stack("attn.proj.bias"))
            put(attn.cpb_fc1.kernel, stack("attn.cpb_mlp.0.weight", transpose=True))
            put(attn.cpb_fc1.bias, stack("attn.cpb_mlp.0.bias"))
            put(attn.cpb_fc2.kernel, stack("attn.cpb_mlp.2.weight", transpose=True))
            put(block.fc1.kernel, stack("mlp.fc1.weight", transpose=True))
            put(block.fc1.bias, stack("mlp.fc1.bias"))
            put(block.fc2.kernel, stack("mlp.fc2.weight", transpose=True))
            put(block.fc2.bias, stack("mlp.fc2.bias"))

        key = str(si)
        if key in backbone.merge_stages:
            merge = backbone.merges[key]
            red = sd[f"layers.{si}.downsample.reduction.weight"]  # (2C, 4C)
            c = red.shape[1] // 4
            red = red.reshape(red.shape[0], 4, c)[:, (0, 2, 1, 3), :]
            put(merge.reduction.kernel, red.reshape(red.shape[0], 4 * c).T)
            put(merge.norm.scale, sd[f"layers.{si}.downsample.norm.weight"])
            put(merge.norm.bias, sd[f"layers.{si}.downsample.norm.bias"])

    logger.info("loaded %d SwinV2 params", loaded)
    return loaded


_HRNET_TRANSITION_CHAIN = re.compile(
    r"^(transition\d)\.(\d+)\.(\d+)\.([01])\.(.+)$"
)
_HRNET_TRANSITION_SIMPLE = re.compile(r"^(transition\d)\.(\d+)\.([01])\.(.+)$")
_HRNET_FUSE_CHAIN = re.compile(
    r"^(stage\d\.\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.([01])\.(.+)$"
)
_HRNET_FUSE_SIMPLE = re.compile(
    r"^(stage\d\.\d+)\.fuse_layers\.(\d+)\.(\d+)\.([01])\.(.+)$"
)


def _translate_hrnet_key(key: str) -> str:
    """torch hrnetv2 state-dict name -> this package's HRNet-16 path.

    The structures match one-to-one; only the Sequential flattenings
    differ: torch nests Sequential(Sequential(conv, bn, relu), ...) where
    this port uses one indexed conv/bn dict, and fuse layer (i, j) pairs
    are dict keys ``i_j``.
    """
    for prefix in ("model.", "module.", "backbone."):
        if key.startswith(prefix):
            key = key[len(prefix):]
    m = _HRNET_TRANSITION_CHAIN.match(key)
    if m:
        t, i, k, c, rest = m.groups()
        return f"{t}.mods.{i}.mods.{2 * int(k) + int(c)}.{rest}"
    m = _HRNET_TRANSITION_SIMPLE.match(key)
    if m:
        t, i, c, rest = m.groups()
        return f"{t}.mods.{i}.mods.{c}.{rest}"
    m = _HRNET_FUSE_CHAIN.match(key)
    if m:
        stage, i, j, k, c, rest = m.groups()
        return f"{stage}.fuse_layers.{i}_{j}.mods.{2 * int(k) + int(c)}.{rest}"
    m = _HRNET_FUSE_SIMPLE.match(key)
    if m:
        stage, i, j, c, rest = m.groups()
        return f"{stage}.fuse_layers.{i}_{j}.{c}.{rest}"
    return key


def load_hrnet_torch(module: nnx.Module, state_dict: Dict) -> Tuple[int, int]:
    """Load a torch hrnetv2/LightHRNet state dict into ``HighResolutionNet16``
    (the ``hr16s_4k_slim.pth`` trunk; reference InverseForm.py:94-133 plays
    this fuzzy-remapping role)."""
    translated = {
        _translate_hrnet_key(k): v
        for k, v in state_dict.items()
        if "num_batches_tracked" not in k
        and not any(p in k for p in ("hrhead", "aux_head", "edge", "ocr"))
    }
    return load_torch_state_dict(module, translated, fuzzy=False)


def load_torch_checkpoint(module: nnx.Module, path, fuzzy: bool = True):
    """Load a ``.pth``/``.pt`` file (or a pickled numpy dict) into a module."""
    import pickle

    try:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # noqa: BLE001 — fall back to plain pickle of numpy dicts
        with open(path, "rb") as fh:
            state = pickle.load(fh)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return load_torch_state_dict(module, state, fuzzy=fuzzy)
