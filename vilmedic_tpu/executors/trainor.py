"""Trainor: the training executor — one jitted SPMD train step + host epoch loop.

Behavioral parity with reference vilmedic/executors/trainor.py:84-203:
- epoch loop with gradient accumulation (optimizer step every ``grad_accu``
  iterations, grads summed — not averaged — like successive ``backward`` calls),
- NaN/Inf-loss skip with accumulated-grad reset (:109-112),
- clip-grad-norm folded into the optax chain,
- eval gating (``eval_start``/``early_stop_start``/``decay_metric_start``),
- early stopping on training loss or a validator metric, best-only checkpointing.

TPU-first design:
- loss+grad+update is ONE jitted function; the batch is sharded over the mesh's
  ``data`` axis and XLA inserts the gradient all-reduce over ICI — replacing
  DataParallel loss.mean() (:105-106) and Accelerate's NCCL backward;
- mixed precision = bf16 compute dtype, so there is no GradScaler state (:96);
- the learning rate is a device scalar driven by the host-side TrainingScheduler.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import __version__
from ..config.config import Config
from ..parallel.mesh import get_mesh, replicate, shard_batch
from .checkpoint import CheckpointSaver, load_checkpoint
from .train_state import TrainState, create_optimizer, gated_update, set_learning_rate
from .utils import create_data_loader, create_model, create_training_scheduler


class Trainor:
    def __init__(self, config, seed):
        self.config = config
        self.seed = seed
        self.ckpt_dir = config.ckpt_dir
        self.ckpt = config.get("ckpt")

        self.eval_start = config.get("eval_start", 0)
        self.decay_metric_start = config.get("decay_metric_start", 0)
        self.early_stop_start = config.get("early_stop_start", 0)
        self.grad_accu = int(config.get("grad_accu", 1) or 1)
        self.clip_grad_norm = config.get("clip_grad_norm")
        # hf_trainer-stack features (reference hf_trainer/callbacks.py:11-168,
        # train.py:339-345): keep every epoch's checkpoint / evaluation-only mode
        # / optional jax.profiler trace of a few early steps.
        self.save_every_epoch = bool(config.get("save_every_epoch", False))
        self.eval_only = bool(config.get("eval_only", False))
        self.profile_dir = config.get("profile_dir")
        # H2D/compute overlap depth: batches i+1..i+depth are device_put (and
        # device-preprocessed) by a background thread while step i runs.
        # 0 disables (synchronous placement, the pre-round-4 behavior).
        self.device_prefetch = int(config.get("device_prefetch", 2) or 0)
        # Donate the carried TrainState into the jitted steps: halves the
        # params+opt_state HBM residency (the lever that fits ViT-base batch
        # 128 on one v5e — docs/performance.md). Donation DELETES the input
        # buffers, so everything that outlives a step holds copies: the
        # initial state un-aliases from model.variables, _sync_model_variables
        # copies for eval, and checkpoint payloads copy opt_state (the async
        # writer serializes while the next epoch trains).
        self.donate_state = bool(config.get("donate_state", True))

        self.logger = logging.getLogger(str(seed))
        self.state_dict = load_checkpoint(self.ckpt) if self.ckpt else None

        self.saver = CheckpointSaver(
            ckpt_dir=self.ckpt_dir, logger=self.logger, seed=self.seed, ckpt=self.ckpt
        )

        self.dl = create_data_loader(config, split="train", logger=self.logger)
        self.model = create_model(
            config, dl=self.dl, logger=self.logger, from_training=True,
            state_dict=self.state_dict, seed=seed,
        )

        optim_params = config.get("optim_params") or {}
        if isinstance(optim_params, Config):
            optim_params = optim_params.to_dict()
        self.base_lr = float(optim_params.get("lr"))
        self.tx = create_optimizer(
            config.get("optimizer", "Adam"), optim_params, self.clip_grad_norm,
            frozen_prefixes=getattr(self.model, "frozen_prefixes", ()),
        )

        self.training_scheduler = create_training_scheduler(
            config, self.base_lr, self.logger, state_dict=self.state_dict,
            total_steps=len(self.dl) * int(config.get("epochs", 1)),
        )

        # Mesh + state: the data axis must divide the per-host batch. An
        # indivisible batch is a hard error (the round-1 gcd fallback silently
        # stranded devices — batch 12 on 8 chips quietly halved throughput);
        # ``allow_device_subset: true`` opts into the old subset behavior.
        import math

        n_devices = len(jax.devices())
        batch_size = int(config.get("batch_size", 1) or 1)
        if jax.process_count() > 1:
            # multi-host SPMD: one global mesh over every device; the loader
            # delivers this host's strided shard and shard_batch reassembles
            # the global batch (reference trainor_accelerate DDP semantics)
            if batch_size % n_devices:
                raise ValueError(
                    f"global batch_size {batch_size} must divide across "
                    f"{n_devices} global devices for multi-host training"
                )
            self.mesh = get_mesh(devices=jax.devices())
            data_size = None  # global mesh set above
        elif batch_size % n_devices and batch_size > n_devices:
            if config.get("allow_device_subset"):
                data_size = math.gcd(batch_size, n_devices) or 1
                self.logger.warning(
                    f"batch_size {batch_size} not divisible across {n_devices} "
                    f"devices; using a {data_size}-device data mesh "
                    f"(allow_device_subset)"
                )
            else:
                down = (batch_size // n_devices) * n_devices
                up = down + n_devices
                raise ValueError(
                    f"batch_size {batch_size} is not divisible across "
                    f"{n_devices} devices — {n_devices - math.gcd(batch_size, n_devices)} "
                    f"chips would sit idle. Use batch_size {down} or {up}, or "
                    f"set allow_device_subset: true to accept a smaller mesh."
                )
        else:
            data_size = min(batch_size, n_devices)
            if data_size < n_devices:
                self.logger.warning(
                    f"batch_size {batch_size} < {n_devices} devices; using a "
                    f"{data_size}-device data mesh"
                )
        if data_size is not None:
            self.mesh = get_mesh(devices=jax.devices()[:data_size])
        params = self.model.variables["params"]
        batch_stats = self.model.variables.get("batch_stats", {})
        if self.donate_state:
            # un-alias from model.variables: replicate() is a device_put that
            # can be a no-op on an already-placed tree, and the first donated
            # step would otherwise delete the model's own arrays
            params = jax.tree.map(jnp.array, params)
            batch_stats = jax.tree.map(jnp.array, batch_stats)
        opt_state = self.tx.init(params)
        if self.state_dict is not None and self.state_dict.get("opt_state"):
            from .train_state import restore_opt_state

            # migrates legacy (pre-multi_transform) checkpoints of
            # freeze-configured models (ADVICE r4)
            opt_state = restore_opt_state(opt_state, self.state_dict["opt_state"])
        self.state = replicate(
            TrainState(
                step=jnp.asarray(0), params=params, opt_state=opt_state,
                batch_stats=batch_stats,
            ),
            self.mesh,
        )
        # Dropout-mask PRNG implementation. Default threefry2x32 (jax's
        # reproducible-everywhere default); "rbg" uses the TPU-native RBG
        # generator — same API, deterministic per key, measurably cheaper for
        # the per-step mask generation (threefry was ~5 ms of a batch-64
        # ViT-base forward on v5e, experiments/microbench_vit_parts.py).
        # Masks differ from threefry's, so fix one impl per training run.
        self.rng = jax.random.key(seed, impl=config.get("rng_impl") or "threefry2x32")
        self._build_steps()

        self.evaluator = None  # set by bin/train
        self.epoch_losses = []  # mean train loss per epoch (observability)

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, tx = self.model, self.tx
        grad_accu = self.grad_accu

        def loss_fn(params, batch_stats, batch, rng):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out, new_stats = model.apply_train(variables, batch, rng, train=True)
            return out["loss"], (out, new_stats)

        # donate the carried state (arg 0): the old state's buffers back the
        # new state's, halving params+opt residency (see donate_state)
        donate = (0,) if self.donate_state else ()

        @functools.partial(jax.jit, donate_argnums=donate)
        def train_step(state: TrainState, batch, lr, rng):
            rng = jax.random.fold_in(rng, state.step)
            (loss, (out, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng)
            # NaN/Inf skip ON DEVICE (reference trainor.py:109-112 checks
            # the loss BEFORE optimizer.step; a host-side check after this jit
            # has run would be too late, and a pre-check sync would serialize
            # the pipeline) — shared gate in train_state.gated_update
            params, opt_state = gated_update(
                tx, state.params, state.opt_state, grads, lr, loss
            )
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state,
                batch_stats=Trainor._gate_stats(
                    jnp.isfinite(loss), new_stats, state.batch_stats
                ),
            )
            return new_state, loss

        @functools.partial(jax.jit, donate_argnums=donate)
        def grad_step(state: TrainState, batch, rng, grad_acc):
            rng = jax.random.fold_in(rng, state.step)
            (loss, (out, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng)
            # non-finite microbatch resets the WHOLE accumulation on device —
            # the reference's zero_grad-on-NaN semantics (trainor.py:111)
            # without a host round-trip
            good = jnp.isfinite(loss)
            grad_acc = jax.tree.map(
                lambda a, g: jnp.where(good, a + g, jnp.zeros_like(a)),
                grad_acc, grads,
            )
            new_state = state.replace(
                step=state.step + 1,
                batch_stats=Trainor._gate_stats(good, new_stats, state.batch_stats),
            )
            return new_state, loss, grad_acc

        @functools.partial(jax.jit, donate_argnums=donate)
        def apply_step(state: TrainState, grads, lr, gate_loss):
            # gate on the boundary microbatch's loss: when IT was non-finite
            # the reference `continue`s past optimizer.step entirely — without
            # this, adamw would still move params via decayed momentum +
            # weight decay (and advance its count) on the zeroed accumulation
            params, opt_state = gated_update(
                tx, state.params, state.opt_state, grads, lr, gate_loss
            )
            return state.replace(params=params, opt_state=opt_state)

        self._train_step = train_step
        self._grad_step = grad_step
        self._apply_step = apply_step

    @staticmethod
    def _gate_stats(good, new_stats, old_stats):
        # keep OLD batch-norm running stats on a non-finite batch: a NaN
        # forward would otherwise write NaN running mean/var and poison every
        # later forward. (Deliberate improvement over the reference, whose
        # torch forward has already updated running stats by the time the
        # loss check at trainor.py:109 runs.)
        if not new_stats:
            return old_stats
        return jax.tree.map(
            lambda n, o: jnp.where(good, n, o), new_stats, old_stats
        )

    def _zero_grads(self):
        return jax.tree.map(jnp.zeros_like, self.state.params)

    def _drain_loss(self, pending, losses, epoch):
        """Read a previous iteration's device loss (by now computed — the
        device runs steps in order, so this doesn't stall the pipeline).
        Non-finite losses were already skipped ON DEVICE by the jitted step;
        here they are only logged and excluded from the epoch mean. Always
        returns None so callers can rebind ``pending``."""
        if pending is None:
            return None
        it, device_loss = pending
        loss = float(device_loss)
        if not np.isfinite(loss):
            self.logger.warning(
                f"NaN/Inf loss at epoch {epoch + 1}, iter {it}. "
                "Step skipped on device..."
            )
        else:
            losses.append(loss)
        return None

    # ------------------------------------------------------------------
    def start(self):
        config = self.config
        scheduler = self.training_scheduler
        epochs = int(config.epochs)

        if self.eval_only:
            # evaluation-only mode (reference hf_trainer/train.py eval path)
            if self.evaluator is not None:
                self.evaluator.start()
            return

        try:
            self._run_epochs(config, scheduler, epochs)
        finally:
            # ALWAYS join the background checkpoint writer — an exception (or
            # KeyboardInterrupt) mid-epoch would otherwise kill the daemon
            # thread mid-write, truncating the only remaining checkpoint
            self.saver.wait()

    def _run_epochs(self, config, scheduler, epochs):
        import time

        for epoch in range(int(scheduler.epoch), epochs + 1):
            epoch_t0 = time.perf_counter()
            self.dl.set_epoch(epoch)
            losses = []
            log = ""
            grad_acc = self._zero_grads() if self.grad_accu > 1 else None
            pending = None  # (iteration, device loss) awaiting the delayed read
            iteration = 0

            custom_print = ""
            profiling = False
            for iteration, batch in enumerate(self._device_batches(), start=1):
                if self.profile_dir and epoch == 0 and iteration == 3:
                    try:
                        jax.profiler.start_trace(self.profile_dir)
                        profiling = True
                    except Exception as e:  # backend without profiler support
                        self.logger.warning(f"profiler unavailable: {e}")
                if profiling and iteration == 6:
                    jax.profiler.stop_trace()
                    profiling = False
                lr = jnp.asarray(scheduler.current_lr(), jnp.float32)

                if hasattr(self.model, "train_iteration"):
                    # Model owns its training step (SCST: rollouts + host
                    # rewards + policy-gradient update). The loss comes back
                    # ON DEVICE (None on a pipelined warmup iteration) and is
                    # drained one step late like the supervised path — the
                    # non-finite gate already ran inside the model's jit.
                    self.state, loss, custom_print = self.model.train_iteration(
                        self, self.state, batch, lr
                    )
                    if loss is not None:
                        pending = self._drain_loss(pending, losses, epoch)
                        pending = (iteration, loss)
                    scheduler.iteration_step(epoch + iteration / max(1, len(self.dl)))
                elif self.grad_accu == 1:
                    self.state, loss = self._train_step(self.state, batch, lr, self.rng)
                    # one-step-delayed host read: the NaN skip itself is
                    # enforced inside the jitted step, so the host only needs
                    # the loss for logging/early-stop. Reading the PREVIOUS
                    # iteration's loss after dispatching this one keeps the
                    # device pipeline full (a per-step float(loss) would add a
                    # blocking round-trip — ~50 ms/step on tunneled hosts).
                    pending = self._drain_loss(pending, losses, epoch)
                    pending = (iteration, loss)
                    scheduler.iteration_step(epoch + iteration / max(1, len(self.dl)))
                else:
                    self.state, loss, grad_acc = self._grad_step(
                        self.state, batch, self.rng, grad_acc
                    )
                    # NaN microbatches reset the accumulation inside grad_step
                    pending = self._drain_loss(pending, losses, epoch)
                    pending = (iteration, loss)
                    if iteration % self.grad_accu == 0:
                        self.state = self._apply_step(self.state, grad_acc, lr, loss)
                        grad_acc = self._zero_grads()
                        scheduler.iteration_step(
                            epoch + iteration / max(1, len(self.dl))
                        )

                if iteration % 10 == 0 or iteration == len(self.dl):
                    # sync the delayed loss at log points so the displayed
                    # mean includes the current step (and 1-batch epochs
                    # don't log 'Loss nan')
                    pending = self._drain_loss(pending, losses, epoch)
                    avg = float(np.mean(losses)) if losses else float("nan")
                    elapsed = time.perf_counter() - epoch_t0
                    eta = elapsed / iteration * (len(self.dl) - iteration)
                    log = (
                        f"Epoch {epoch + 1}, Lr {scheduler.current_lr():.3g}, "
                        f"Loss {avg:.4f}, {scheduler.early_stop_metric} "
                        f"{scheduler.current_best_metric:.4g}, ES {scheduler.early_stop}, "
                        f"{iteration}/{len(self.dl)} it, ETA {eta:.0f}s "
                        f"{custom_print}"
                    )

            if profiling:  # short epochs: close the trace
                jax.profiler.stop_trace()

            if hasattr(self.model, "finish_epoch"):
                # pipelined SCST: grad-step the trailing rollout at the epoch
                # boundary so no batch is dropped (models/scst_models.py)
                tail = self.model.finish_epoch(
                    self, self.state,
                    jnp.asarray(scheduler.current_lr(), jnp.float32),
                )
                if tail is not None:
                    self.state, tail_loss, custom_print = tail
                    pending = self._drain_loss(pending, losses, epoch)
                    pending = (iteration, tail_loss)

            pending = self._drain_loss(pending, losses, epoch)  # flush the last loss

            # final partial accumulation step (reference :143-155)
            if self.grad_accu > 1 and iteration % self.grad_accu != 0 and losses:
                lr = jnp.asarray(scheduler.current_lr(), jnp.float32)
                self.state = self._apply_step(self.state, grad_acc, lr, loss)
                scheduler.iteration_step(epoch + 1.0)

            if log:
                self.logger.info(log)
            scheduler.epoch_step()
            self._sync_model_variables()

            # --- evaluation / early stopping (reference :160-203) ----------
            early_stop_score = None
            decay_metric = None
            do_early_stop = epoch + 1 >= self.early_stop_start
            do_lr_decay = epoch + 1 >= self.decay_metric_start
            do_eval = epoch + 1 >= self.eval_start
            training_loss = float(np.mean(losses)) if losses else float("inf")
            self.epoch_losses.append(training_loss)

            early_stop_metric = config.get("early_stop_metric")
            if early_stop_metric == "training_loss" and do_early_stop:
                early_stop_score = training_loss

            if do_eval and self.evaluator is not None:
                self.evaluator.epoch = epoch
                self.evaluator.start()
                if early_stop_metric != "training_loss" and do_early_stop:
                    early_stop_score = float(
                        np.mean([s[early_stop_metric] for s in self.evaluator.scores])
                    )

            if do_lr_decay:
                decay_metric = (
                    training_loss
                    if scheduler.decay_on_training_loss
                    else early_stop_score
                )

            ret = scheduler.eval_step(
                decay_metric=decay_metric, early_stop_score=early_stop_score
            )
            if self.save_every_epoch and jax.process_index() == 0:
                # seed-stamped per-epoch checkpoint (reference
                # hf_trainer/callbacks.py EpochCheckpointCallback)
                from .checkpoint import save_checkpoint

                path = f"{self.ckpt_dir}/epoch_{epoch + 1}_{self.seed}.ckpt"
                save_checkpoint(
                    path,
                    {
                        "model": self.model.variables,
                        "opt_state": self._ckpt_opt_state(),
                        "training_scheduler": scheduler.state_dict(),
                        "config": config.to_dict() if hasattr(config, "to_dict") else dict(config),
                        "__version__": __version__,
                    },
                )
                self.logger.info(f"{path} saved.")
            if ret["save_state"] and jax.process_index() == 0:
                self.saver.save(
                    payload={
                        "model": self.model.variables,
                        "opt_state": self._ckpt_opt_state(),
                        "training_scheduler": scheduler.state_dict(),
                        "config": config.to_dict() if hasattr(config, "to_dict") else dict(config),
                        "__version__": __version__,
                    },
                    tag=early_stop_score,
                    current_epoch=epoch + 1,
                )
            if ret["done_training"]:
                self.logger.info("Early stop reached")
                return

    # ------------------------------------------------------------------
    def _device_batches(self):
        """Iterate the epoch's batches already placed on the mesh.

        With ``device_prefetch > 0`` (default 2) placement — ``shard_batch``'s
        H2D copy plus the jitted u8 crop+normalize — runs in a background
        thread overlapping the train step on the previous batch
        (data/loader.DevicePrefetch). Synchronous fallback otherwise.
        """
        place = lambda b: shard_batch(self._model_batch(b), self.mesh)  # noqa: E731
        if self.device_prefetch > 0:
            from ..data.loader import DevicePrefetch

            return iter(DevicePrefetch(self.dl, place, depth=self.device_prefetch))
        return (place(b) for b in self.dl)

    def _model_batch(self, batch):
        """Keep only array-valued entries the jitted step can consume, and run
        pending device-side preprocessing (u8 -> normalized float images)."""
        from ..data.image import prepare_batch

        batch = prepare_batch(batch, self.dl.dataset)
        return {k: v for k, v in batch.items() if v is None or hasattr(v, "shape")}

    def _sync_model_variables(self):
        params, batch_stats = self.state.params, self.state.batch_stats
        if self.donate_state:
            # eval and the ASYNC checkpoint writer hold these across the next
            # epoch's donated steps — they must not share buffers with state
            params = jax.tree.map(jnp.array, params)
            batch_stats = jax.tree.map(jnp.array, batch_stats)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        self.model.variables = variables

    def _ckpt_opt_state(self):
        """opt_state snapshot for checkpoint payloads (copied under donation:
        the background writer serializes while later steps reuse the buffers)."""
        if self.donate_state:
            return jax.tree.map(
                lambda x: jnp.array(x) if hasattr(x, "dtype") else x,
                self.state.opt_state,
            )
        return self.state.opt_state
