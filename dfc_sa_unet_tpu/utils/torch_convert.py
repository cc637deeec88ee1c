"""Generic PyTorch state_dict -> Flax variables converter.

Works for every model in the zoo because the Flax modules follow one
naming rule: a torch key is split on '.', purely-numeric components are
folded into the previous name (``conv_branch.0`` -> ``conv_branch_0``),
and the leaf maps by kind:

  weight (4D conv)        -> kernel    OIHW -> HWIO  (2,3,1,0)
  weight (4D conv-transp) -> kernel_t  IOHW -> HWIO' (2,3,0,1)
  weight (2D linear)      -> kernel    transposed
  weight (1D norm)        -> scale
  bias                    -> bias
  running_mean / running_var -> batch_stats mean / var
  num_batches_tracked     -> dropped
  anything else (gamma, res_scale, pos_embed, in_proj_weight, ...)
                          -> same-named param; 2D values transposed if
                            that is what matches the target shape.

Used for (a) loading reference ``.pth`` checkpoints into the TPU stack
(reference inference.py:222-229 accepts both raw state_dicts and trainer
checkpoints with a 'model_state_dict' key — so do we), and (b) the
numerical-parity test suite.
"""

from typing import Any, Dict, Mapping

import numpy as np


def _merge_numeric(parts):
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return merged


def _get(tree: Mapping[str, Any], path):
    node = tree
    for p in path:
        if not isinstance(node, Mapping) or p not in node:
            return None
        node = node[p]
    return node


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def torch_state_dict_to_variables(state_dict: Mapping[str, Any], template: Mapping[str, Any]):
    """Convert a torch state_dict into Flax ``{'params':..,'batch_stats':..}``.

    ``template`` is the variables dict from ``model.init`` — used to locate
    destinations and validate shapes.  Raises on any unmapped or
    shape-mismatched tensor, and on template params left unassigned.
    """
    if "model_state_dict" in state_dict and not any("." in k for k in list(state_dict)[:5]):
        state_dict = state_dict["model_state_dict"]

    params_t = template.get("params", {})
    stats_t = template.get("batch_stats", {})
    out_params: Dict[str, Any] = {}
    out_stats: Dict[str, Any] = {}
    assigned = set()

    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        val = _to_numpy(tensor).astype(np.float32)
        parts = _merge_numeric(key.split("."))
        leaf = parts[-1]
        prefix = parts[:-1]

        if leaf in ("running_mean", "running_var"):
            dest_leaf = "mean" if leaf == "running_mean" else "var"
            path = tuple(prefix) + (dest_leaf,)
            target = _get(stats_t, path)
            if target is None:
                raise KeyError(f"no batch_stats destination for torch key {key!r} (path {path})")
            if tuple(target.shape) != val.shape:
                raise ValueError(f"{key}: shape {val.shape} vs template {tuple(target.shape)}")
            _set(out_stats, path, val)
            assigned.add(("batch_stats",) + path)
            continue

        node = _get(params_t, tuple(prefix))
        if node is None:
            raise KeyError(f"no params destination module for torch key {key!r} (path {prefix})")

        if leaf == "weight":
            if "kernel" in node:
                dest, target = "kernel", node["kernel"]
                if val.ndim == 4:
                    val = val.transpose(2, 3, 1, 0)
                elif val.ndim == 2:
                    val = val.T
            elif "kernel_t" in node:
                dest, target = "kernel_t", node["kernel_t"]
                val = val.transpose(2, 3, 0, 1)
            elif "scale" in node:
                dest, target = "scale", node["scale"]
            else:
                raise KeyError(f"cannot map {key!r}: module has keys {list(node)}")
        elif leaf == "bias":
            dest, target = "bias", node.get("bias")
            if target is None:
                raise KeyError(f"{key!r}: template has no bias at {prefix}")
        else:
            if leaf not in node:
                raise KeyError(f"cannot map {key!r}: module has keys {list(node)}")
            dest, target = leaf, node[leaf]
            if val.shape != tuple(target.shape) and val.ndim == 2 and val.T.shape == tuple(target.shape):
                val = val.T

        val = val.reshape(tuple(np.shape(target)))  # () scalars etc.
        if tuple(np.shape(target)) != val.shape:
            raise ValueError(f"{key}: shape {val.shape} vs template {tuple(np.shape(target))}")
        path = tuple(prefix) + (dest,)
        _set(out_params, path, val)
        assigned.add(("params",) + path)

    # Verify completeness against the template.
    def _walk(tree, coll, at=()):
        for k, v in tree.items():
            if isinstance(v, Mapping):
                _walk(v, coll, at + (k,))
            else:
                full = (coll,) + at + (k,)
                if full not in assigned:
                    raise KeyError(f"template leaf {full} was not assigned from the state_dict")

    _walk(params_t, "params")
    _walk(stats_t, "batch_stats")

    result = {"params": out_params}
    if stats_t:
        result["batch_stats"] = out_stats
    return result


def load_torch_checkpoint(path: str, template: Mapping[str, Any]):
    """Load a reference ``.pth`` file (raw state_dict or trainer checkpoint
    with 'model_state_dict') and convert it to Flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return torch_state_dict_to_variables(ckpt, template)


# ---------------------------------------------------------------------------
# The reverse direction: Flax variables -> PyTorch state_dict.
#
# Lets checkpoints trained on TPU flow back into the reference's torch
# tooling (reference inference.py:222-229 loads raw state_dicts, so the
# export is directly servable there).  The naming rule inverts cleanly:
# trailing ``_<digits>`` segments on module names were folded numeric
# Sequential indices (``conv_branch_0`` <- ``conv_branch.0``) and unfold
# back to dots; leaf kinds invert by the same permutations (all are
# self-inverse or have the explicit inverse applied here).  Round-trip
# exactness vs every reference model family is pinned in
# tests/test_torch_export.py.
# ---------------------------------------------------------------------------


def _unfold_numeric(name: str):
    """'conv_branch_0_1' -> ['conv_branch', '0', '1']; 'down1' -> ['down1']."""
    tail = []
    while "_" in name:
        head, _, last = name.rpartition("_")
        if not last.isdigit():
            break
        tail.insert(0, last)
        name = head
    return [name] + tail


def variables_to_torch_state_dict(variables: Mapping[str, Any]) -> "OrderedDict[str, np.ndarray]":
    """Convert Flax ``{'params':..,'batch_stats':..}`` to a torch-style
    state_dict of numpy arrays (keyed/laid out exactly as the reference
    PyTorch models expect; float leaves cast to float32).

    BatchNorm modules (identified by a ``mean`` entry in batch_stats) get a
    ``num_batches_tracked`` int64 zero — torch's strict ``load_state_dict``
    requires the key; its value does not affect eval/inference math.
    """
    from collections import OrderedDict

    out: "OrderedDict[str, np.ndarray]" = OrderedDict()

    def _leaf(val) -> np.ndarray:
        a = np.asarray(val)
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(np.float32)
        return a

    def _walk_params(node, prefix):
        for name, v in node.items():
            if isinstance(v, Mapping):
                _walk_params(v, prefix + _unfold_numeric(name))
                continue
            a = _leaf(v)
            key_prefix = ".".join(prefix)
            if name == "kernel":
                if a.ndim == 4:  # HWIO -> OIHW
                    a = a.transpose(3, 2, 0, 1)
                elif a.ndim == 2:  # flax [in,out] -> torch [out,in]
                    a = a.T
                out[f"{key_prefix}.weight"] = a
            elif name == "kernel_t":  # HWIO' -> IOHW (self-inverse perm)
                out[f"{key_prefix}.weight"] = a.transpose(2, 3, 0, 1)
            elif name == "scale":
                out[f"{key_prefix}.weight"] = a
            elif name == "bias":
                out[f"{key_prefix}.bias"] = a
            else:
                # gamma, res_scale, pos_embed, in_proj_weight, ... — the
                # forward converter transposes a 2-D value ONLY when the
                # shapes demand it (val.shape != target.shape).  A square
                # matrix can never trip that test, so the forward stores
                # it in torch orientation — transposing it here would
                # silently corrupt the export (shapes still match, strict
                # load succeeds, torch computes with W.T).  Invert exactly
                # the forward's rule: transpose non-square 2-D only.
                if a.ndim == 2 and a.shape[0] != a.shape[1]:
                    a = a.T
                out[f"{key_prefix}.{name}" if key_prefix else name] = a

    def _walk_stats(node, prefix):
        for name, v in node.items():
            if isinstance(v, Mapping):
                _walk_stats(v, prefix + _unfold_numeric(name))
                continue
            key_prefix = ".".join(prefix)
            if name == "mean":
                out[f"{key_prefix}.running_mean"] = _leaf(v)
            elif name == "var":
                out[f"{key_prefix}.running_var"] = _leaf(v)
                out[f"{key_prefix}.num_batches_tracked"] = np.zeros((), np.int64)
            else:
                raise KeyError(f"unknown batch_stats leaf {name!r} at {key_prefix}")

    _walk_params(variables.get("params", {}), [])
    _walk_stats(variables.get("batch_stats", {}), [])
    return out


def save_torch_checkpoint(path: str, variables: Mapping[str, Any]):
    """Write Flax variables as a raw torch ``.pth`` state_dict, loadable by
    the reference's ``inference.py --model`` and ``pretrained_path``."""
    import torch

    sd = variables_to_torch_state_dict(variables)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
