"""Native checkpointing via Orbax (SURVEY.md §5 'Checkpoint / resume').

The reference uses tf.train.Saver V2 ckpts via estimator hooks; here Orbax
provides async-capable save/restore of the param/opt-state pytrees, plus
resume-from-latest (`tf.estimator`'s auto-resume contract).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from dan_tpu.config import DANConfig


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Save a parameter pytree to `path` (an empty/new directory)."""
    with _checkpointer() as ckptr:
        ckptr.save(os.path.abspath(os.path.join(path, "params")), params)


def restore_params(path: str, config: Optional[DANConfig] = None) -> Any:
    """Restore a parameter pytree.

    Accepts any of:
      * a dir written by save_params (contains 'params/');
      * a train model_dir (contains 'step_NNNNNNNN/' TrainState saves —
        the latest one's .params is extracted);
      * a direct TrainState step dir.
    So `eval.py --ckpt <model_dir>` works straight off a training run.
    """
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "params")):
        with _checkpointer() as ckptr:
            return _check_config(ckptr.restore(os.path.join(path, "params")), config, path)
    step = latest_step(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    with _checkpointer() as ckptr:
        state = ckptr.restore(path)
    if isinstance(state, dict) and "params" in state:
        return _check_config(_checked_params(state["params"], path), config, path)
    # orbax restores NamedTuples as sequences/dicts depending on save form;
    # TrainState order is (params, opt_state, step).
    if isinstance(state, (list, tuple)) and len(state) == 3:
        return _check_config(_checked_params(state[0], path), config, path)
    return _check_config(state, config, path)


def _check_config(tree: Any, config: Optional[DANConfig], path: str) -> Any:
    """When a config is supplied, verify the restored tree's structure and
    leaf shapes against what that config's detector would initialize — a
    checkpoint from a different architecture fails loudly here instead of
    erroring deep inside the first forward pass."""
    if config is None:
        return tree
    import jax

    from dan_tpu.models.detector import init_detector_params

    want = jax.eval_shape(
        lambda: init_detector_params(jax.random.PRNGKey(0), config.model)
    )
    want_shapes = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    got_shapes = {
        jax.tree_util.keystr(k): getattr(v, "shape", None)
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    if want_shapes != got_shapes:
        extra = set(got_shapes) - set(want_shapes)
        missing = set(want_shapes) - set(got_shapes)
        diff = {
            k: (want_shapes[k], got_shapes[k])
            for k in set(want_shapes) & set(got_shapes)
            if want_shapes[k] != got_shapes[k]
        }
        raise ValueError(
            f"checkpoint at {path} does not match the supplied config: "
            f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
            f"shape_mismatches={dict(list(diff.items())[:5])}"
        )
    return tree


def _checked_params(tree: Any, path: str) -> Any:
    """Guard the positional TrainState fallback: a field reorder/addition
    would silently hand back the wrong subtree as `params`."""
    expected = {"backbone", "heads", "lfpn", "l2norm"}
    if not (isinstance(tree, dict) and expected <= set(tree)):
        raise ValueError(
            f"checkpoint at {path} did not yield a detector param tree "
            f"(want keys >= {sorted(expected)}, got "
            f"{sorted(tree) if isinstance(tree, dict) else type(tree)}); "
            "restore with restore_train_state(abstract_state) instead"
        )
    return tree


class TrainStateSaver:
    """Long-lived ASYNC TrainState saver (SURVEY.md §5: 'Orbax async
    checkpoint every N steps').

    orbax's StandardCheckpointer is an AsyncCheckpointer: save() blocks only
    for the device->host staging copy; serialization + directory finalize
    run on a background thread, so the train step loop keeps dispatching
    while the previous checkpoint is still being written.  (Round 1 made
    this synchronous by np.asarray-copying the state on the caller thread
    and close()-ing — i.e. joining — the checkpointer after every save.)

    latest_step() only counts finalized 'step_N' dirs, so a crash mid-write
    (orbax tmp dir) never breaks resume.

    max_to_keep bounds disk use like the reference's tf.train.Saver
    (default 5 there too): after each save, older FINALIZED step dirs
    beyond the newest max_to_keep are pruned. Pruning renames to a
    '.pruning' suffix first (atomic), so a crash mid-delete can never
    leave a half-deleted dir that latest_step()/resume would pick up.

    Concurrency contract: retention assumes a SINGLE writer per root, and
    concurrent readers restore only latest_step() (which pruning never
    touches — it keeps the newest max_to_keep).  A reader restoring an
    OLDER step while a trainer is saving can race _prune and fail
    mid-restore when its dir is renamed away; run such eval jobs on a
    copy, or with max_to_keep=None on the trainer.
    """

    def __init__(self, max_to_keep: Optional[int] = 5):
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def save(self, root: str, step: int, state: Any) -> str:
        path = os.path.abspath(os.path.join(root, f"step_{step:08d}"))
        self._ckptr.save(path, state)
        self._prune(os.path.abspath(root), step)
        return path

    def _prune(self, root: str, current: int) -> None:
        if not self.max_to_keep:
            return
        import re
        import shutil

        # Sweep leftovers from a crash between rename and rmtree first —
        # a '.pruning' dir never matches the step pattern again, so
        # without this it would hold a full TrainState's disk forever.
        for d in os.listdir(root):
            if d.endswith(".pruning"):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

        finalized = sorted(
            int(m.group(1))
            for d in os.listdir(root)
            if (m := re.fullmatch(r"step_(\d+)", d))
        )
        # The just-saved step is usually still an orbax tmp dir (async
        # write) and absent from `finalized` — count it toward the keep
        # budget anyway so retention is exactly max_to_keep, newest-first.
        keep = set(sorted(set(finalized) | {current})[-self.max_to_keep :])
        for s in (s for s in finalized if s not in keep):
            src = os.path.join(root, f"step_{s:08d}")
            tmp = src + ".pruning"
            try:
                os.rename(src, tmp)
                shutil.rmtree(tmp, ignore_errors=True)
            except OSError:
                pass  # concurrent reader/pruner: leave it for next time

    def wait(self) -> None:
        """Join all outstanding background writes."""
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_train_state(root: str, step: int, state: Any) -> str:
    """Synchronous one-shot TrainState save (tests / scripts that exit
    immediately after).  Training loops should hold a TrainStateSaver."""
    with TrainStateSaver() as saver:
        path = saver.save(root, step, state)
        saver.wait()
    return path


def latest_step(root: str) -> Optional[int]:
    """Latest COMPLETE checkpoint step.  Only exact 'step_<digits>' dirs
    count — a preempted save leaves Orbax temp dirs
    ('step_N.orbax-checkpoint-tmp...') that must not break resume."""
    import re

    if not os.path.isdir(root):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.fullmatch(r"step_(\d+)", d))
    ]
    return max(steps) if steps else None


def restore_train_state(root: str, abstract_state: Any, step: Optional[int] = None):
    """Restore the latest (or a specific) TrainState; `abstract_state` is a
    matching pytree of arrays/ShapeDtypeStructs giving structure."""
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = os.path.abspath(os.path.join(root, f"step_{step:08d}"))
    with _checkpointer() as ckptr:
        return ckptr.restore(path, abstract_state)
