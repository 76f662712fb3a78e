"""Train-state checkpoint/resume for the model families (orbax-backed).

The reference has no training loop, so its only persistence surfaces are
the CMVN stats file (reference post.py:107-116, mirrored by
:meth:`speech_tpu.post.Standardize.save`) and this repo's per-family
``save_params``/``load_params`` npz helpers.  Those cover *inference*
hand-off; resuming an interrupted *training* run also needs the
optimizer state, the step counter, and any loop metadata — atomically
written, rotated, and restorable onto a different device mesh.  This
module is that production piece, built on orbax's ``CheckpointManager``:

- ``TrainCheckpointer(directory).save(step, params, opt_state, extra=...)``
  writes one atomic checkpoint per step and keeps the newest
  ``max_to_keep``.
- ``restore(like=(params, opt_state))`` reads the latest (or a specific)
  step back *into the template's structure*: optax named-tuple states
  round-trip, dtypes are preserved, and when a template leaf is a
  ``jax.Array`` its sharding is applied on restore — so resuming onto an
  8-device mesh just passes mesh-sharded (or ``jax.eval_shape``-style
  abstract) templates.

Checkpoints are synchronous by default (``save`` returns only after the
files are durable), matching the manifest-resume discipline of the
corpus CLIs; pass ``async_save=True`` to overlap serialization with the
next training step and call :meth:`TrainCheckpointer.wait` before
exiting.
"""

import os
from typing import Any, Optional, Tuple

import numpy as np

import jax

__all__ = ["TrainCheckpointer"]


def _abstractify(tree):
    """Template pytree -> abstract pytree for orbax restore.

    Keeps each leaf's shape/dtype and, when the leaf is a committed
    ``jax.Array`` (or already a ``ShapeDtypeStruct`` carrying one), its
    sharding — restore then lands the arrays directly on those devices.
    """

    def leaf(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        dtype = getattr(x, "dtype", None)
        return jax.ShapeDtypeStruct(
            np.shape(x),
            dtype if dtype is not None else np.asarray(x).dtype,
            sharding=x.sharding if isinstance(x, jax.Array) else None,
        )

    return jax.tree_util.tree_map(leaf, tree)


class TrainCheckpointer:
    """Rotated, resumable train-state checkpoints in ``directory``.

    The saved state is the triple the generic
    :func:`speech_tpu.models.make_train_step` threads through training —
    ``params`` and ``opt_state`` — plus an optional ``extra`` pytree of
    loop metadata (epoch, data cursor, PRNG key, ...).  ``consts`` (the
    frozen half of ``model.init``) are *not* saved: they are
    deterministic functions of the model config, so resume rebuilds them
    with ``model.init`` and restores only the trained half.
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        async_save: bool = False,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
            # lets a fresh manager read tree metadata (restore_params)
            # without having saved/restored through it first
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    # -- writing -----------------------------------------------------------

    def save(
        self, step: int, params: Any, opt_state: Any, extra: Any = None
    ) -> None:
        """Write one checkpoint for ``step`` (atomic; rotates old steps)."""
        state = {"params": params, "opt_state": opt_state}
        if extra is not None:
            state["extra"] = extra
        self._mgr.save(int(step), args=self._ocp.args.StandardSave(state))

    def wait(self) -> None:
        """Block until any in-flight async save is durable."""
        self._mgr.wait_until_finished()

    # -- reading -----------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        """Newest saved step, or ``None`` if the directory has none."""
        return self._mgr.latest_step()

    def all_steps(self):
        """Steps currently on disk (oldest first), after rotation."""
        return sorted(self._mgr.all_steps())

    def restore(
        self,
        like: Tuple[Any, Any],
        step: Optional[int] = None,
        extra_like: Any = None,
    ):
        """Load ``(step, params, opt_state, extra)`` from disk.

        ``like`` is a ``(params, opt_state)`` template with the target
        structure — typically a fresh ``model.init`` + ``tx.init`` pair
        (cheap; never trained).  Leaves may be concrete arrays or
        ``jax.ShapeDtypeStruct``; committed ``jax.Array`` leaves restore
        onto their sharding, so a mesh-sharded template resumes training
        directly on the mesh.  ``extra_like`` mirrors the ``extra``
        pytree passed to :meth:`save` (omit it if none was saved).
        ``step=None`` restores the latest.
        """
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self._mgr.directory}"
                )
        template = {
            "params": _abstractify(like[0]),
            "opt_state": _abstractify(like[1]),
        }
        if extra_like is not None:
            # a template for a subtree the checkpoint never saved would
            # surface as an opaque orbax structure-mismatch — check first
            tree = self._metadata_tree(step)
            if tree is not None and "extra" not in tree:
                raise ValueError(
                    f"extra_like was passed but checkpoint step {step} was "
                    "saved without an 'extra' pytree (save(..., extra=...) "
                    "was not used); omit extra_like to restore it"
                )
            template["extra"] = _abstractify(extra_like)
        else:
            # the checkpoint may still carry an "extra" subtree; orbax
            # restore needs the full saved structure, so reconstruct it
            # from the checkpoint's own metadata rather than erroring
            tree = self._metadata_tree(step)
            if tree is not None and "extra" in tree:
                # the reconstructed extra is RETURNED to the caller (it
                # will typically feed the training loop), so it must land
                # on the default device — the host-CPU placement is only
                # for restore_params's discarded subtrees
                template["extra"] = self._abstract_from_metadata(
                    tree["extra"], host=False
                )
        try:
            restored = self._mgr.restore(
                int(step),
                args=self._ocp.args.StandardRestore(template),
            )
        except Exception as e:
            if extra_like is not None and self._metadata_tree(step) is None:
                # the descriptive pre-check above needs the metadata tree,
                # which a fresh manager without item_handlers cannot
                # produce (known orbax gotcha) — wrap the opaque
                # structure-mismatch with the same hint instead
                raise ValueError(
                    f"restoring step {step} with extra_like failed and "
                    "the checkpoint metadata is unavailable on this "
                    "manager.  If this checkpoint was saved WITHOUT "
                    "save(..., extra=...), omit extra_like; the original "
                    f"orbax error follows: {e}"
                ) from e
            raise
        return (
            int(step),
            restored["params"],
            restored["opt_state"],
            restored.get("extra"),
        )

    def restore_params(self, like: Any, step: Optional[int] = None):
        """Load only the trained ``params`` (for serving/eval hand-off).

        ``like`` is the params template alone — no optimizer or ``tx`` is
        needed, which is exactly the situation at serving time.  The
        optimizer-state/extra subtrees are reconstructed as anonymous
        abstract leaves from the checkpoint's own metadata and discarded.
        """
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self._mgr.directory}"
                )
        tree = self._metadata_tree(step)
        abstract = {
            key: (
                _abstractify(like)
                if key == "params"
                else self._abstract_from_metadata(tree[key])
            )
            for key in tree
        }
        restored = self._mgr.restore(
            int(step), args=self._ocp.args.StandardRestore(abstract)
        )
        return restored["params"]

    def _metadata_tree(self, step: int):
        """The on-disk pytree metadata for ``step`` (shapes/dtypes)."""
        meta = self._mgr.item_metadata(int(step))
        return meta.tree if hasattr(meta, "tree") else meta

    @staticmethod
    def _abstract_from_metadata(subtree, host: bool = True):
        """Metadata subtree -> abstract leaves (explicit sharding so
        restore never warns about missing sharding info).

        With ``host=True`` (the default, used for *discarded* subtrees —
        optimizer moments during ``restore_params``) leaves land on a
        host CPU device when one exists: materializing them on a
        tunneled TPU would pay device transfer for thrown-away data.
        Subtrees handed back to the caller pass ``host=False`` and land
        on the default device.
        """
        if host:
            try:
                dev = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                dev = jax.devices()[0]
        else:
            dev = jax.devices()[0]
        host_sh = jax.sharding.SingleDeviceSharding(dev)
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=host_sh
            ),
            subtree,
        )

    # -- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
