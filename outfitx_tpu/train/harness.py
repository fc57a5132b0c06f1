"""Trainer harness: the reusable training framework layer.

TPU-native re-design of the reference's ``DistributedTrainer`` ABC
(distributed_trainer.py; SURVEY.md L1). Same public surface — context manager
+ ``run()`` + abstract hooks + checkpoint/log gateways — with the distributed
substrate swapped: instead of process-group rendezvous, DDP wrapping, and
cross-rank error broadcast, the harness owns a `jax.sharding.Mesh`, places
params/batches by sharding spec, and lets XLA insert all collectives. In
JAX's SPMD model every process executes one program, so the reference's
``safe_process_context`` error-broadcast machinery (:189-204) is unnecessary
by construction; multi-host init reduces to `jax.distributed.initialize()`.
"""

from __future__ import annotations

import abc
import contextlib
import logging
import pathlib
import sys
import time
from typing import Any, Dict, Optional

import jax

from outfitx_tpu.core.config import TrainConfig
from outfitx_tpu.core.mesh import MeshSpec, make_mesh, shard_params
from outfitx_tpu.train.checkpoint import BestMetricTracker, CheckpointManager
from outfitx_tpu.train.metrics_log import MetricsLogger

RUN_MODES = ("train-valid", "test", "custom")


class Trainer(abc.ABC):
    """Context-managed trainer.

    Usage (mirrors reference run/cp.py:5-9)::

        with CPTrainer(cfg, run_mode="train-valid") as t:
            t.run()
    """

    def __init__(self, cfg: TrainConfig, run_mode: str = "train-valid"):
        if run_mode not in RUN_MODES:
            raise ValueError(f"run_mode {run_mode!r} not in {RUN_MODES}")
        self.cfg = cfg
        self.run_mode = run_mode
        self.epoch = 0
        self.mesh = None
        self.logger: Optional[logging.Logger] = None
        self.ckpt: Optional[CheckpointManager] = None
        self.best = BestMetricTracker(**self.best_metrics())
        self._mesh_ctx = None
        self.metrics_log: Optional[MetricsLogger] = None
        self.profile_dir: Optional[str] = None  # set to enable jax.profiler

    # ------------------------------------------------------------ hooks --
    @property
    @abc.abstractmethod
    def model_name(self) -> str: ...

    def best_metrics(self) -> Dict[str, str]:
        """metric -> 'max'|'min' for best-checkpoint tracking."""
        return {}

    @abc.abstractmethod
    def load_model(self) -> None: ...

    @abc.abstractmethod
    def load_optimizer(self) -> None: ...

    @abc.abstractmethod
    def setup_data(self) -> None: ...

    def hook_after_setup(self) -> None:
        """Warm-start / checkpoint chaining point (reference
        complementary_item_retrieval_trainer.py:344-359)."""

    @abc.abstractmethod
    def train_epoch(self, epoch: int) -> Dict[str, float]: ...

    @abc.abstractmethod
    def valid_epoch(self, epoch: int) -> Dict[str, float]: ...

    def test(self) -> Dict[str, float]:
        raise NotImplementedError(f"{type(self).__name__} has no test mode")

    def custom_task(self) -> Any:
        raise NotImplementedError(f"{type(self).__name__} has no custom task")

    # ------------------------------------------------------------ setup --
    def setup(self) -> None:
        from outfitx_tpu.core.runtime import (
            apply_env_flags,
            enable_compilation_cache,
        )

        enable_compilation_cache()
        apply_env_flags()
        self.setup_logger()
        self.metrics_log = MetricsLogger(self.cfg.log_dir, self.model_name)
        self.setup_mesh()
        self.ckpt = CheckpointManager(self.cfg.checkpoint_dir, self.model_name)
        self.load_model()
        # Data before optimizer: the OneCycle horizon needs len(train_split).
        self.setup_data()
        self.load_optimizer()
        self.hook_after_setup()

    def setup_logger(self) -> None:
        self.logger = logging.getLogger(self.model_name)
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False  # root logger would double-print
        if not self.logger.handlers:
            fmt = logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s %(message)s"
            )
            sh = logging.StreamHandler(sys.stderr)
            sh.setFormatter(fmt)
            self.logger.addHandler(sh)
            log_dir = pathlib.Path(self.cfg.log_dir)
            log_dir.mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(log_dir / f"{self.model_name}.log")
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)

    def setup_mesh(self) -> None:
        from outfitx_tpu.parallel import maybe_initialize_distributed

        maybe_initialize_distributed()
        n = len(jax.devices())
        data, model = self.cfg.mesh.resolve(n)
        self.mesh = make_mesh(MeshSpec(data=data, model=model))
        self._mesh_ctx = jax.set_mesh(self.mesh)
        self._mesh_ctx.__enter__()
        self.log(
            f"mesh: data={data} model={model} over {n} "
            f"{jax.devices()[0].platform} device(s)"
        )

    def shard_model_params(self, model, params):
        """Apply TP/FSDP partition specs when the mesh calls for them
        (pure-DP keeps params replicated)."""
        mc = self.cfg.mesh
        if self.mesh is None or (mc.model <= 1 and not mc.fsdp):
            return params
        specs = model.param_partition_specs(fsdp=mc.fsdp)
        return shard_params(self.mesh, params, specs)

    # -------------------------------------------------------------- run --
    def run(self) -> Any:
        if self.run_mode == "train-valid":
            result = None
            for epoch in range(self.epoch, self.cfg.n_epochs):
                self.epoch = epoch
                profiling = self.profile_dir is not None and epoch == 1
                if profiling:  # epoch 0 is compile-dominated; trace epoch 1
                    jax.profiler.start_trace(self.profile_dir)
                t0 = time.perf_counter()
                train_metrics = self.train_epoch(epoch)
                valid_metrics = self.valid_epoch(epoch)
                dt = time.perf_counter() - t0
                if profiling:
                    jax.profiler.stop_trace()
                    self.log(f"profiler trace written to {self.profile_dir}")
                train_metrics = dict(train_metrics or {})
                if train_metrics:
                    train_metrics["epoch_seconds"] = dt
                self.log_metrics("train", epoch, train_metrics)
                self.log_metrics("valid", epoch, valid_metrics)
                self.log(f"epoch {epoch} done in {dt:.1f}s")
                self.maybe_save_latest(epoch)
                result = valid_metrics
            return result
        if self.run_mode == "test":
            metrics = self.test()
            self.log_metrics("test", self.epoch, metrics)
            return metrics
        return self.custom_task()

    # ---------------------------------------------------------- logging --
    def log(self, msg: str, level: int = logging.INFO) -> None:
        if self.logger:
            self.logger.log(level, msg)

    def log_metrics(
        self, split: str, epoch: int, metrics: Dict[str, float]
    ) -> None:
        """Namespace: {metric}/{split}/epoch (reference wandb scheme,
        wandb_test.py / compatibility_prediction_trainer.py:120,186)."""
        if not metrics:
            return
        parts = " ".join(f"{k}={v:.5f}" for k, v in metrics.items())
        self.log(f"[{split}] epoch {epoch}: {parts}")
        if self.metrics_log is not None:
            self.metrics_log.log(split, epoch, metrics)

    # ------------------------------------------------------ checkpoints --
    def _ckpt_save(self, tag: str, **kwargs) -> None:
        """Route a mid-run save through the async writer (default): the
        training loop pays only a device snapshot (~ms) instead of the
        20-120 s relay D2H + orbax write a synchronous save of envelope-
        scale state costs. `cfg.async_saves=False` restores sync saves."""
        if getattr(self.cfg, "async_saves", False):
            self.ckpt.save_async(tag, **kwargs)
        else:
            self.ckpt.save(tag, **kwargs)

    def maybe_save_best(
        self, metrics: Dict[str, float], *, params, epoch: int
    ) -> None:
        for name, value in metrics.items():
            if name in self.best.mode and self.best.update(name, value):
                self._ckpt_save(
                    f"best_{name}",
                    params=params,
                    epoch=epoch,
                    metrics=metrics,
                    config=self.cfg,
                    best=self.best.best,
                )
                self.log(f"saved best_{name} ({value:.5f}) at epoch {epoch}")

    def maybe_save_latest(self, epoch: int) -> None:
        """Rolling resume point every ``cfg.save_every_epochs`` epochs: full
        state (params + opt_state + step + best-so-far), overwritten in
        place, so a relay drop mid-campaign costs at most N epochs."""
        every = getattr(self.cfg, "save_every_epochs", 0)
        if not every or (epoch + 1) % every:
            return
        state = getattr(self, "state", None)
        if state is None or self.ckpt is None:
            return
        t0 = time.perf_counter()
        self._ckpt_save(
            "latest",
            params=state.params,
            opt_state=state.opt_state,
            step=int(state.step),
            epoch=epoch,
            config=self.cfg,
            best=self.best.best,
        )
        import jax

        went_async = (
            getattr(self.cfg, "async_saves", False)
            and jax.process_count() == 1  # save_async falls back sync else
        )
        self.log(
            f"saved latest (epoch {epoch}) in {time.perf_counter()-t0:.1f}s"
            + (" (queued async)" if went_async else "")
        )

    def resume(self, tag_or_path: str = "final") -> None:
        """Restore params (+opt_state/step/epoch when present) and continue
        training from the next epoch. The reference has no auto-resume
        (SURVEY.md 5 'recovery is manual') — this is the improvement."""
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }
        payload = self.ckpt.restore(tag_or_path, template=template)

        def _replace_on_live_shardings(live_tree, restored_tree):
            # Restored leaves arrive as host arrays; re-place them onto the
            # live tree's shardings so a TP/FSDP run resumes sharded instead
            # of silently re-replicating params+opt_state over the mesh.
            return jax.tree.map(
                lambda live, x: jax.device_put(x, live.sharding)
                if isinstance(live, jax.Array)
                else x,
                live_tree,
                restored_tree,
            )

        self.state = self.state.replace(
            params=_replace_on_live_shardings(
                self.state.params, payload["params"]
            )
        )
        if payload.get("opt_state") is not None:
            import jax.numpy as jnp

            self.state = self.state.replace(
                opt_state=_replace_on_live_shardings(
                    self.state.opt_state, payload["opt_state"]
                ),
                step=jnp.asarray(payload["meta"].get("step", 0), jnp.int32),
            )
        self.epoch = int(payload["meta"].get("epoch", -1)) + 1
        # Restore best-so-far metric values so the first post-resume eval
        # cannot clobber a better best_* checkpoint with a worse model.
        for name, value in payload["meta"].get("best", {}).items():
            if name in self.best.mode:
                self.best.best[name] = float(value)
        self.log(f"resumed from {tag_or_path} at epoch {self.epoch}")

    # ---------------------------------------------------------- context --
    def __enter__(self) -> "Trainer":
        self.setup()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        try:
            # drain pending async saves FIRST — even on exceptional exit a
            # queued best/latest save must reach disk (and stay FIFO-
            # ordered before the final save below). An async-writer
            # failure must NOT abort the final save: the final state is
            # healthy regardless of an earlier transient write error, so
            # save final first and surface the stored error after.
            pending_err = None
            if self.ckpt is not None:
                try:
                    self.ckpt.wait()
                except Exception as e:
                    if exc_type is None:
                        pending_err = e
            if exc_type is None and self.run_mode == "train-valid":
                params = getattr(self, "state", None)
                if params is not None and self.ckpt is not None:
                    self.ckpt.save(
                        "final",
                        params=self.state.params,
                        opt_state=self.state.opt_state,  # enables resume
                        step=int(self.state.step),
                        epoch=self.epoch,
                        config=self.cfg,
                        best=self.best.best,
                    )
                    self.log("saved final checkpoint")
            if pending_err is not None:
                raise pending_err
        finally:
            if self.metrics_log is not None:
                with contextlib.suppress(Exception):
                    self.metrics_log.close()
            if self._mesh_ctx is not None:
                with contextlib.suppress(Exception):
                    self._mesh_ctx.__exit__(exc_type, exc, tb)
            # Close only THIS trainer's handlers (a global logging.shutdown
            # would leave closed handlers attached for the next in-process
            # trainer — chained runs/tests — silently dropping its logs);
            # removing them lets a later setup_logger re-attach fresh ones.
            if self.logger is not None:
                for h in list(self.logger.handlers):
                    with contextlib.suppress(Exception):
                        h.close()
                    self.logger.removeHandler(h)
