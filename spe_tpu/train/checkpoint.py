"""Orbax checkpointing (replaces torch.save of {model, optimizer,
lr_scheduler, epoch, args}, reference main.py:259-269 / resume :223-233)."""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Tuple

import orbax.checkpoint as ocp

from spe_tpu.config import SPEConfig
from spe_tpu.train.train_step import TrainState


def save_checkpoint(path, state: TrainState, epoch: int, cfg: SPEConfig) -> None:
    """COLLECTIVE in multi-process runs: orbax synchronizes processes
    internally even for host-numpy trees, so EVERY process must call this
    (the array data itself is written once — params/opt_state are pulled to
    host numpy first and identical everywhere since they're replicated).
    meta.json is written by process 0 only (save_on_master semantics)."""
    import jax
    import numpy as np

    from spe_tpu.train.optim import FusedAdamWState

    path = Path(path).resolve()
    tree = (dataclasses.asdict(state) if dataclasses.is_dataclass(state)
            else state._asdict())
    # lr_vec is a pure function of (config, param shapes): don't persist the
    # params-sized buffer. restore_checkpoint always rebuilds it from the
    # CURRENT config, so resuming with a changed lr/lr_backbone takes effect
    # instead of silently keeping a stale checkpointed vector.
    if isinstance(tree.get("opt_state"), FusedAdamWState):
        # 1-element placeholder (orbax refuses zero-size arrays)
        tree["opt_state"] = tree["opt_state"]._replace(
            lr_vec=np.zeros((1,), np.float32))
    tree = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", tree, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {"epoch": epoch, "config": dataclasses.asdict(cfg)}
        (path / "meta.json").write_text(json.dumps(_jsonable(meta)))


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (str, int, float, bool)) or x is None:
        return x
    return str(x)


def load_params_lenient(path, params):
    """Merge a checkpoint's params into `params` by matching tree paths;
    keys absent from the checkpoint (e.g. a new segm head) keep their
    initialization. Used by --frozen_weights (reference main.py:218-220)."""
    import flax

    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(Path(path).resolve() / "state")
    saved = flax.traverse_util.flatten_dict(raw["params"])
    ours = flax.traverse_util.flatten_dict(params)
    merged = {k: saved.get(k, v) for k, v in ours.items()}
    return flax.traverse_util.unflatten_dict(merged)


def resolve_resume(resume: str, cache_dir=None) -> Path:
    """Support URL checkpoints like the reference's torch.hub download
    (main.py:224-226). Orbax checkpoints are directories, so a URL must
    point at a .zip/.tar(.gz) archive of one; it is downloaded once into
    ~/.cache/spe_tpu/checkpoints and extracted."""
    if "://" not in resume:
        return Path(resume)
    import os
    import urllib.parse
    import urllib.request

    cache = Path(cache_dir or os.path.expanduser("~/.cache/spe_tpu/checkpoints"))
    cache.mkdir(parents=True, exist_ok=True)
    name = Path(urllib.parse.urlparse(resume).path).name
    local = cache / name
    if not local.exists():
        print(f"downloading checkpoint {resume} -> {local}")
        urllib.request.urlretrieve(resume, local)
    for suffix, opener in ((".zip", "zip"), (".tar.gz", "tar"), (".tgz", "tar"),
                           (".tar", "tar")):
        if name.endswith(suffix):
            dest = cache / name[: -len(suffix)]
            if not dest.exists():
                if opener == "zip":
                    import zipfile

                    with zipfile.ZipFile(local) as z:
                        z.extractall(dest)
                else:
                    import tarfile

                    with tarfile.open(local) as t:
                        t.extractall(dest)
            # archives may wrap the checkpoint in a single root directory
            entries = [p for p in dest.iterdir() if p.name != "__MACOSX"]
            if len(entries) == 1 and entries[0].is_dir() and not (
                    dest / "meta.json").exists():
                return entries[0]
            return dest
    return local


# state leaves that are pure functions of (config, param shapes): always
# rebuilt from the current state's optimizer init, never read from (or
# required in) the checkpoint — so resuming with a changed lr config takes
# effect, and checkpoints written before the field existed still restore.
_DERIVED_LEAVES = {("opt_state", "lr_vec")}


def _merge_saved(cur, saved, path, missing):
    """Recursively fill the current state's structure with checkpoint values
    (orbax raw restores are name-keyed nested dicts; NamedTuple nodes in the
    live structure correspond to field-name dict keys in the checkpoint)."""
    if path in _DERIVED_LEAVES:
        return cur
    if hasattr(cur, "_asdict"):  # NamedTuple node
        d = cur._asdict()
        sub = saved if isinstance(saved, dict) else {}
        return type(cur)(**{k: _merge_saved(v, sub.get(k), path + (k,), missing)
                            for k, v in d.items()})
    if isinstance(cur, dict):
        sub = saved if isinstance(saved, dict) else {}
        return {k: _merge_saved(v, sub.get(k), path + (str(k),), missing)
                for k, v in cur.items()}
    if isinstance(cur, (tuple, list)):  # e.g. optax chain states ("0","1",…)
        sub = saved if isinstance(saved, dict) else {}
        return type(cur)(_merge_saved(v, sub.get(str(i)), path + (str(i),),
                                      missing)
                         for i, v in enumerate(cur))
    if saved is None:
        missing.append(".".join(path))
        return cur
    return saved


def restore_checkpoint(path, state: TrainState) -> Tuple[TrainState, int]:
    """Restore into the given state by tree path; returns (state, epoch).
    Accepts a local directory or a URL to an archived checkpoint.

    Matching is by name path (not strict structure); any leaf other than the
    derived ones (see _DERIVED_LEAVES) missing from the checkpoint is an
    error, not a silent partial restore."""
    path = resolve_resume(str(path)).resolve()
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path / "state")
    missing: list = []
    merged = {k: _merge_saved(v, raw.get(k) if isinstance(raw, dict) else None,
                              (k,), missing)
              for k, v in state._asdict().items()}
    if missing:
        raise ValueError(
            f"checkpoint {path} is missing {len(missing)} leaves, e.g. "
            f"{missing[:5]} — refusing a silent partial restore "
            f"(use load_params_lenient for params-only merges)")
    meta = json.loads((path / "meta.json").read_text())
    return TrainState(**merged), int(meta["epoch"])
