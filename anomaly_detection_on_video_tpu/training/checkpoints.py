"""Orbax checkpointing (role of Lightning ModelCheckpoint in the reference,
configs/trainer/callbacks/model_checkpoint.yaml: save_last + top-k by
monitored AUC — whose monitor-name mismatch bug, SURVEY.md §3.2, is fixed
here by monitoring the actual logged metric).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

METADATA_FILE = "hparams.json"


class TopKCheckpointer:
    """Keeps the top-k states by metric plus the most recent state.

    Checkpoint directories are self-describing: ``write_metadata`` persists
    the run's hyperparameters (model class/config, data and optimizer
    settings) as ``hparams.json`` next to the orbax steps — the role of the
    reference's ``save_hyperparameters`` (reference: src/runner.py:23) — so
    ``infer.py --checkpoint`` can rebuild the exact model without the user
    re-supplying ``--model-config`` overrides.
    """

    def __init__(self, directory: str, top_k: int = 10, every_n_steps: int = 0):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options_kwargs = {}
        if jax.process_count() > 1:
            # in a multi-host run only process 0 saves (run.py); scope
            # orbax's internal barriers to THIS process or the bare
            # CheckpointManager constructor blocks on a global device sync
            # the other (checkpointer-less) processes never join
            from orbax.checkpoint import options as ocp_options

            pid = jax.process_index()
            options_kwargs["multiprocessing_options"] = (
                ocp_options.MultiprocessingOptions(
                    primary_host=pid, active_processes={pid}
                )
            )
            # orbax refuses create=True with active_processes; the
            # os.makedirs above already created the root
            options_kwargs["create"] = False
        from orbax.checkpoint import checkpoint_managers as ocp_cm

        # top-k by metric UNION the most recent step (the reference's
        # save_top_k + save_last, model_checkpoint.yaml). max_to_keep +
        # best_fn alone is NOT that: orbax keeps only the best N, so a
        # metric-less save (preemption, eval-less epochs) would be
        # garbage-collected as soon as k better checkpoints existed and a
        # resume would silently lose the newest steps.
        preservation = ocp_cm.AnyPreservationPolicy(
            [
                ocp_cm.LatestN(1),
                ocp_cm.BestN(
                    get_metric_fn=lambda m: m.get("metric", -1.0),
                    n=top_k,
                    keep_checkpoints_without_metrics=False,
                ),
            ]
        )
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                preservation_policy=preservation,
                # retention is governed by preservation_policy above;
                # best_fn's remaining role is flipping orbax's _track_best
                # so per-step metrics are PERSISTED (JsonSave next to the
                # arrays) — without it manager.metrics() is always None
                # and resolve_step("best") could never see past saves
                best_fn=lambda m: m.get("metric", -1.0),
                best_mode="max",
                **options_kwargs,
            ),
        )
        self.every_n_steps = every_n_steps
        self._last_saved = -1

    def save(
        self, step: int, state: Any, metric: Optional[float] = None
    ) -> Optional[str]:
        """Save and return the on-disk checkpoint path (None if skipped)."""
        if self.every_n_steps and step - self._last_saved < self.every_n_steps:
            return None
        def host_leaf(x):
            # a multi-host run gates saving to process 0 (run.py), whose
            # orbax has no peers to coordinate with — global arrays are
            # assembled on host from THIS process's addressable shards so
            # the save is local. Fully-replicated (DP) state always
            # assembles; TP-sharded state assembles too under the
            # row-major (data, model) mesh layout, where every model
            # column crosses each process (parallel/mesh.make_mesh), so
            # process 0 holds every distinct shard.
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                if x.is_fully_replicated:
                    return np.asarray(x)
                out = np.zeros(x.shape, x.dtype)
                covered = np.zeros(x.shape, bool)
                for shard in x.addressable_shards:
                    out[shard.index] = np.asarray(shard.data)
                    covered[shard.index] = True
                if not covered.all():
                    raise NotImplementedError(
                        "this process's shards do not cover the array; "
                        "save from the process that holds every shard or "
                        "use an all-process checkpointer"
                    )
                return out
            return x

        payload = jax.tree_util.tree_map(
            host_leaf,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
            },
        )
        if step in self.manager.all_steps():
            # a run resumed from an earlier step (checkpoint_step=best or
            # an exact step) re-walks step numbers that already exist on
            # disk; orbax silently no-ops saving an existing step, which
            # would strand the stale pre-resume state — delete it first
            self.manager.delete(step)
        self.manager.save(
            step,
            args=ocp.args.StandardSave(payload),
            # metric-less saves (preemption, eval-less epochs) carry no
            # metrics entry: they are preserved only while latest
            metrics=None if metric is None else {"metric": float(metric)},
        )
        self._last_saved = step
        return os.path.join(self.directory, str(step))

    def resolve_step(self, selector: Any = "latest") -> Optional[int]:
        """Turn a checkpoint selector into a concrete saved step.

        ``"latest"``/``None`` → the most recent step; ``"best"`` → the
        step with the highest recorded metric (ties broken toward the
        newer step; falls back to latest when no save carried a metric,
        e.g. preemption-only checkpoints); an int (or digit string) → that
        exact step, raising with the available steps listed if absent.
        The selection surface of Lightning's ``ckpt_path`` / ``best``
        (the reference resumes via Trainer.fit(ckpt_path=...); run.py:35).
        Returns None when the directory holds no checkpoints.
        """
        # isinstance check first: `selector == True` would also match the
        # exact step 1 (Python bools are ints), silently resuming latest
        if selector is None or isinstance(selector, bool) or selector == "latest":
            return self.manager.latest_step()
        if selector == "best":
            best_step, best_metric = None, None
            for s in sorted(self.manager.all_steps()):
                m = self.manager.metrics(s) or {}
                if "metric" not in m:
                    continue
                v = float(m["metric"])
                if best_metric is None or v >= best_metric:
                    best_step, best_metric = s, v
            if best_step is not None:
                return best_step
            return self.manager.latest_step()
        step = int(selector)
        if step not in self.manager.all_steps():
            raise ValueError(
                f"checkpoint step {step} not found in {self.directory}; "
                f"available steps: {sorted(self.manager.all_steps())}"
            )
        return step

    def restore(self, state: Any, step: Any = "latest") -> Any:
        """Restore a checkpoint into an existing TrainState template
        (shapes must match). ``step`` is a ``resolve_step`` selector:
        "latest" (default), "best", or an exact step number."""
        step = self.resolve_step(step)
        if step is None:
            return state
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        try:
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except Exception as exc:
            restored = self._restore_legacy_opt_state(step, template, exc)
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def _restore_legacy_opt_state(
        self, step: int, template: Dict[str, Any], exc: Exception
    ) -> Dict[str, Any]:
        """Retry a failed restore against the pre-grad-clip optimizer layout.

        ``adam_with_l2`` used to build a 2-slot optax chain
        (add_decayed_weights, adam); it now always has 3 slots with an
        identity in front (knob-invariant layout). A checkpoint saved by
        the old code restores by dropping the template's fresh slot 0
        (identity/clip state — stateless either way). Anything else gets a
        clear error instead of orbax's raw tree-mismatch."""
        opt = template["opt_state"]
        if isinstance(opt, tuple) and len(opt) == 3:
            legacy = dict(template, opt_state=tuple(opt[1:]))
            try:
                restored = self.manager.restore(
                    step, args=ocp.args.StandardRestore(legacy)
                )
            except Exception:
                pass
            else:
                import warnings

                warnings.warn(
                    f"checkpoint step {step} carries a legacy 2-slot "
                    "optimizer state (pre-gradient-clip layout); migrated "
                    "by prepending the fresh identity slot"
                )
                restored["opt_state"] = (opt[0],) + tuple(
                    restored["opt_state"]
                )
                return restored
        raise ValueError(
            f"could not restore checkpoint step {step} from "
            f"{self.directory}: the saved tree does not match the restore "
            "template — typically the model config or optimizer settings "
            "differ from the run that wrote the checkpoint (see "
            f"{METADATA_FILE} in the checkpoint directory)"
        ) from exc

    def restore_latest(self, state: Any) -> Any:
        """Restore the most recent checkpoint (restore(step="latest"))."""
        return self.restore(state, step="latest")

    def write_metadata(self, metadata: Dict[str, Any]) -> str:
        """Atomically persist run hyperparameters as <dir>/hparams.json."""
        path = os.path.join(self.directory, METADATA_FILE)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(metadata, f, indent=2, default=str)
        os.replace(tmp, path)
        return path

    @staticmethod
    def load_metadata(directory: str) -> Optional[Dict[str, Any]]:
        """Read hparams.json from a checkpoint dir (None if absent)."""
        path = os.path.join(os.path.abspath(directory), METADATA_FILE)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def wait(self) -> None:
        self.manager.wait_until_finished()
