"""Training loop / evaluation / checkpoint orchestration.

TPU-native equivalent of the reference ``Trainer`` (nerf/utils.py:316-
1137, sdf/utils.py:85-371): owns workspace+logging, optimizer/LR
schedule, EMA, metrics, checkpoint retention and best-tracking, and
the epoch loop. Differences by design:

- the train step is a single jitted pure function (params/opt-state
  donated); no ``GradScaler`` (bf16), no ``.item()`` sync per step —
  scalars are fetched asynchronously every ``log_every`` steps.
- device-side state (e.g. NeRF density grid) lives in the workload's
  ``aux_state`` pytree, threaded through the step functions.

Subclasses implement:
  - ``init_state(rng) -> TrainState``
  - ``train_step(state, aux, batch, rng) -> (state, aux, metrics_dict)``
    (must be jit-compatible; Trainer jits it once)
  - ONE evaluation contract: either ``eval_step(state, aux, batch) ->
    {"loss": ...}`` (batch-loss workloads, e.g. SDF) or an
    ``eval_metric(valid)`` override (rendering workloads key best
    checkpoints on -PSNR via their ``evaluate``). ``train`` and the
    NeRF-family ``train_on_dataset`` both select best checkpoints
    through ``eval_metric`` — a single best-path contract
    (nerf/utils.py:1053-1073).
"""

from __future__ import annotations

import os
import time
from typing import Any, Iterable, Optional

import jax
import optax

from ngp_tpu.training import checkpoints as ckpt_lib
from ngp_tpu.training.state import TrainState


class Trainer:
    def __init__(
        self,
        name: str,
        workspace: str = "workspace",
        lr: float = 1e-3,
        lr_decay_target: float = 0.1,
        max_steps: int = 30000,
        ema_decay: Optional[float] = 0.95,
        max_keep_ckpt: int = 2,
        eval_interval: int = 1,
        log_every: int = 100,
        use_tensorboard: bool = True,
        seed: int = 0,
    ):
        self.name = name
        self.workspace = workspace
        self.lr = lr
        self.max_steps = max_steps
        self.ema_decay = ema_decay
        self.max_keep_ckpt = max_keep_ckpt
        self.eval_interval = eval_interval
        self.log_every = log_every
        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": [], "best_loss": None}
        # serializing a full state pytree costs seconds; with short
        # epochs a per-epoch save (the reference's cadence) dominates
        # wall time, so throttle to at most one save per interval
        self.ckpt_min_interval_s = 120.0
        self._last_ckpt_time = 0.0

        os.makedirs(workspace, exist_ok=True)
        self.log_path = os.path.join(workspace, f"log_{name}.txt")
        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(workspace, "run", name))
            except Exception:
                self.writer = None

        # exponential LR decay to lr * target at max_steps, stepped per
        # iteration — the reference's LambdaLR(0.1 ** min(iter/max, 1))
        # (main_nerf.py scheduler).
        self.schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=max_steps,
            decay_rate=lr_decay_target,
            end_value=lr * lr_decay_target,
        )
        self.tx = self.make_optimizer()
        self.rng = jax.random.PRNGKey(seed)
        self.state: Optional[TrainState] = None
        self.aux: Any = None
        self._jit_train_step = None

    # ---- subclass hooks --------------------------------------------------

    def make_optimizer(self) -> optax.GradientTransformation:
        """Adam(eps 1e-15) as the reference mains (main_nerf.py:112)."""
        return optax.adam(self.schedule, b1=0.9, b2=0.99, eps=1e-15)

    def init_state(self, rng) -> TrainState:
        raise NotImplementedError

    def init_aux(self) -> Any:
        return None

    def train_step(self, state, aux, batch, rng):
        raise NotImplementedError

    def eval_step(self, state, aux, batch):
        raise NotImplementedError(
            "implement eval_step (batch-loss eval) or override "
            "eval_metric (e.g. -PSNR via evaluate) for best-checkpoint "
            "selection"
        )

    def eval_metric(self, valid) -> float:
        """Best-checkpoint selection metric (LOWER is better) from the
        validation input. Default: mean eval_step loss over a batch
        iterable. Rendering trainers override to -PSNR."""
        return self.evaluate_one_epoch(valid)

    def on_step_begin(self):
        """Hook called before every train step (host-side; used by the
        occupancy-grid trainer for periodic density-grid refresh)."""

    # ---- profiling -------------------------------------------------------

    def profile_steps(self, loader, n_steps: int = 20, logdir: Optional[str] = None):
        """Capture a jax.profiler trace of n_steps train steps
        (TPU-native replacement for the reference's ad-hoc
        torch.cuda.Event timing, SURVEY.md §5). View with
        tensorboard --logdir <workspace>/profile."""
        import jax.profiler

        self.ensure_initialized()
        logdir = logdir or os.path.join(self.workspace, "profile")
        it = iter(loader)
        with jax.profiler.trace(logdir):
            for _ in range(n_steps):
                batch = next(it)
                self.rng, k = jax.random.split(self.rng)
                self.state, self.aux, metrics = self._jit_train_step(
                    self.state, self.aux, batch, k
                )
            jax.block_until_ready(metrics)
        self.log(f"profile trace written to {logdir}")
        return logdir

    # ---- logging ---------------------------------------------------------

    def log(self, msg: str):
        stamp = time.strftime("%H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")

    # ---- lifecycle -------------------------------------------------------

    def ensure_initialized(self):
        if self.state is None:
            self.rng, k = jax.random.split(self.rng)
            self.state = self.init_state(k)
            self.aux = self.init_aux()
        if self._jit_train_step is None:
            self._jit_train_step = jax.jit(self.train_step, donate_argnums=(0,))

    def step(self, batch):
        """One training step with the host-side bookkeeping custom
        loops otherwise forget: on_step_begin (occupancy-refresh
        cadence keys off global_step — skipping the counter makes the
        grid refresh EVERY step, ~2x slower) + rng split + step counter.
        Returns the metrics dict (device values; don't block on it
        every step)."""
        self.ensure_initialized()
        self.on_step_begin()
        self.rng, k = jax.random.split(self.rng)
        self.state, self.aux, metrics = self._jit_train_step(
            self.state, self.aux, batch, k
        )
        self.global_step += 1
        return metrics

    def train(
        self,
        train_loader: Iterable,
        valid_loader: Optional[Iterable] = None,
        max_epochs: int = 1,
    ):
        self.ensure_initialized()
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            self.train_one_epoch(train_loader)
            # EMA updates happen per-step inside apply_gradients
            if (
                epoch == max_epochs
                or time.time() - self._last_ckpt_time > self.ckpt_min_interval_s
            ):
                self.save_checkpoint()
                self._last_ckpt_time = time.time()
            if valid_loader is not None and epoch % self.eval_interval == 0:
                metric = self.eval_metric(valid_loader)
                if (
                    self.stats["best_loss"] is None
                    or metric < self.stats["best_loss"]
                ):
                    self.stats["best_loss"] = metric
                    self.save_checkpoint(best=True)

    def train_one_epoch(self, loader: Iterable):
        t0 = time.perf_counter()
        pending = []  # (step, device scalars) fetched lazily
        n_steps = 0
        for batch in loader:
            self.on_step_begin()
            self.rng, k = jax.random.split(self.rng)
            self.state, self.aux, metrics = self._jit_train_step(
                self.state, self.aux, batch, k
            )
            self.global_step += 1
            n_steps += 1
            pending.append((self.global_step, metrics))
            if len(pending) >= self.log_every:
                self._flush_metrics(pending)
                pending = []
        self._flush_metrics(pending)
        dt = time.perf_counter() - t0
        self.log(
            f"epoch {self.epoch}: {n_steps} steps in {dt:.2f}s "
            f"({n_steps / max(dt, 1e-9):.1f} it/s)"
        )

    def _flush_metrics(self, pending):
        if not pending:
            return
        step, metrics = pending[-1]
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        self.stats["loss"].append(host.get("loss", 0.0))
        if self.writer is not None:
            for k, v in host.items():
                self.writer.add_scalar(f"train/{k}", v, step)
            self.writer.add_scalar("train/lr", float(self.schedule(step)), step)
        self.log(
            f"step {step}: "
            + " ".join(f"{k}={v:.6f}" for k, v in host.items())
        )
        # turbo budget overflow: CALIBRATED estimate of dropped samples
        # (march_rays_turbo scales never-fine-tested drops by the ray's
        # measured fine-pass rate; far-first drops mostly land behind
        # already-opaque geometry — the reference's mean_count cap
        # truncates the same way). Measured scale: a converged healthy
        # scene sits near ~0.1; genuinely underbudgeted training
        # (error-map-concentrated batches at compact_mean_samples=6)
        # reads 0.4-0.5 with a visible PSNR cost. The 0.3 threshold
        # separates the two (verified in test_turbo_march /
        # drive_errormap_ab)
        if host.get("turbo_overflow", 0.0) > 0.3 and step > 256:
            self.log(
                f"[warn] turbo sample-budget overflow at "
                f"{host['turbo_overflow']:.1%}: raise coarse_candidates/"
                f"crossing_slots/compact_mean_samples or the scene "
                f"loses far samples (watch eval PSNR)"
            )

    def evaluate_one_epoch(self, loader: Iterable) -> float:
        total, n = 0.0, 0
        for batch in loader:
            out = self.eval_step(self.state, self.aux, batch)
            total += float(out["loss"])
            n += 1
        loss = total / max(n, 1)
        self.stats["valid_loss"].append(loss)
        self.log(f"eval epoch {self.epoch}: loss={loss:.6f}")
        if self.writer is not None:
            self.writer.add_scalar("eval/loss", loss, self.global_step)
        return loss

    # ---- checkpoints -----------------------------------------------------

    def _ckpt_pytree(self):
        return {"state": self.state, "aux": self.aux}

    def _extra_ckpt_metadata(self) -> dict:
        """Workload-specific JSON-able checkpoint metadata (e.g.
        TensoRF stores its current factor resolution)."""
        return {}

    def save_checkpoint(self, best: bool = False):
        state = self._ckpt_pytree()
        if best and self.state.ema_params is not None:
            # best checkpoint uses EMA weights (nerf/utils.py:1053-1073)
            state = dict(state)
            state["state"] = self.state.replace(params=self.state.ema_params)
        ckpt_lib.save_checkpoint(
            self.workspace,
            self.name,
            state,
            extras={
                "global_step": self.global_step,
                "stats": {
                    k: v for k, v in self.stats.items() if not isinstance(v, list)
                },
                **self._extra_ckpt_metadata(),
            },
            epoch=self.epoch,
            max_keep=self.max_keep_ckpt,
            best=best,
        )

    def load_checkpoint(self, path: Optional[str] = None) -> bool:
        self.ensure_initialized()
        if path is None:
            path = ckpt_lib.latest_checkpoint(self.workspace, self.name)
        if path is None or not os.path.exists(path):
            self.log("no checkpoint found, training from scratch")
            return False
        restored, extras = ckpt_lib.load_checkpoint(path, self._ckpt_pytree())
        self.state = restored["state"]
        self.aux = restored["aux"]
        self.global_step = extras.get("global_step", 0)
        self.epoch = extras.get("epoch", 0)
        skipped = extras.get("restore_skipped", [])
        if skipped:
            self.log(
                f"checkpoint restore: kept fresh values for {len(skipped)} "
                f"missing/mismatched keys: {skipped}"
            )
            self._post_restore(skipped)
        self.log(f"loaded checkpoint {path} (epoch {self.epoch})")
        return True

    def _post_restore(self, skipped_keys: list) -> None:
        """Hook after a tolerant (partial) checkpoint restore: rebuild
        any derived state whose keys were skipped. Default: nothing."""
