"""ProgressiveGANTrainer — the framework runtime.

Orchestration parity with the reference's three-layer stack collapsed into
one coherent runtime class:
  * `ModelInterface` template methods (`lib/model.py`): set_dataset /
    set_data_iterator / set_optimizers / set_loss_collector / save_image /
    validation / checkpointing
  * `ProgressiveGAN` trainer (`pggan/model.py`): schedule jumps, solver
    resets, train_step, checkpoint of schedule state
  * `train.py` driver loop: loss/test/ckpt cycles, wandb-style logging

TPU-native structure: at any moment the trainer holds ONE compiled train
step for the current scale. A scale jump performs, in order (matching
`change_scale`, `pggan/model.py:158-174`):
  1. grow G and D pytrees (depths[scale_index], fresh random leaves)
  2. reset the data pipeline at the new resolution 2^(scale+2)
  3. fresh Adam state (the reference discards moments at every jump)
  4. build + jit the next scale's train step (compiles on first call)
  5. reset alpha schedule
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pggan_tpu.config import Config
from pggan_tpu.data import DataPipeline, build_dataset, split_dataset
from pggan_tpu.losses.collector import LossCollector
from pggan_tpu.models import (
    grow_discriminator_params,
    grow_generator_params,
    init_discriminator_params,
    init_generator_params,
)
from pggan_tpu.parallel import (
    create_mesh,
    global_batch_size,
    replicate,
    shard_batch,
)
from pggan_tpu.train.schedule import ProgressiveSchedule
from pggan_tpu.train.step import (
    TrainState,
    init_train_state,
    make_chunked_train_step,
    make_optimizers,
    make_train_step,
    resolve_steps_per_dispatch,
)
from pggan_tpu.utils import checkpoint as ckpt_lib
from pggan_tpu.utils.image import save_image as save_image_grid
from pggan_tpu.utils.image import unpack_space_to_depth
from pggan_tpu.utils.logging import MetricLogger


def _unpack_image_np(img: np.ndarray, packed: bool) -> np.ndarray:
    """Host-side depth_to_space2 for packed images ([B,h,w,12] →
    [B,2h,2w,3] — utils/image.unpack_space_to_depth). `packed` comes from
    the caller's resolve_hires_pack — packedness must NOT be inferred from
    the channel count (a genuine output_dim=4 unpacked image is divisible
    by 4 and would be scrambled by a shape-sniffing heuristic)."""
    return unpack_space_to_depth(img) if packed else img


class ProgressiveGANTrainer:
    """Create via `pggan_tpu.registry.create_model(cfg)` (the
    `CreateModel` analog, `lib/model_loader.py:4-37`) or directly."""

    def __init__(self, cfg: Config):
        from pggan_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        # Single-process SPMD: "master" is process 0 (multi-host) — there
        # is no per-GPU process hierarchy to manage (`lib/model_loader.py:5`).
        self.is_master = jax.process_index() == 0
        cfg.isMaster = self.is_master
        self.mesh = create_mesh(cfg)
        self.schedule = ProgressiveSchedule.from_config(cfg, verbose=self.is_master)
        self.global_step = 0

        seed = int(cfg.seed)
        base = jax.random.PRNGKey(seed)
        self._rng_G = jax.random.fold_in(base, 0)
        self._rng_D = jax.random.fold_in(base, 1)
        self._rng_state = jax.random.fold_in(base, 2)

        self.state: Optional[TrainState] = None
        self.loss_collector: Optional[LossCollector] = None
        self.logger: Optional[MetricLogger] = None
        self._step_fn = None
        self._chunk_fn = None
        self._chunk_size = 1
        self._chunks_dispatched = 0
        self._r1_interval = 1
        from concurrent.futures import ThreadPoolExecutor
        self._ckpt_pool = ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="pggan-ckpt")
        self._ckpt_future = None
        self._fid_sampler = None
        self._fid_sampler_packed = False
        self._val_fn = None
        self._fid_extractor_cache = None
        self._eval_ds = None
        self._rate_anchor = None        # (time, step) for imgs_per_sec
        self._pipeline: Optional[DataPipeline] = None
        self._valid_pipeline: Optional[DataPipeline] = None
        self._train_indices = None
        self._valid_indices = None

    # -- construction sequence (lib/model_loader.py:13-21 order) -------------
    def setup(self):
        if self.cfg.ckpt_id is not None:
            # Resume builds ONCE at the restored scale: load_checkpoint
            # restores args + schedule, then runs the same
            # initialize_models/set_dataset/set_data_iterator sequence
            # itself — pre-building the scale-0 state here would compile,
            # scan, and spawn workers only to throw it all away.
            self.load_checkpoint()
        else:
            self.initialize_models()
            self.set_optimizers()
            self.set_dataset()
            self.set_data_iterator()
        # After any restore, so the collector's max_step denominator and
        # cycles reflect the restored args.
        self.set_loss_collector()
        self._build_step_fn()
        return self

    def initialize_models(self):
        cfg = self.cfg
        scale = self.schedule.scale_index

        # Jit the whole init: one compiled program instead of ~100 per-op
        # device dispatches (matters over the remote-TPU tunnel).
        @jax.jit
        def _init(rng_g, rng_d):
            params_G = init_generator_params(
                rng_g, latent_dim=cfg.latent_dim, depths=cfg.depths,
                scale=scale, output_dim=cfg.output_dim,
                equalized_lr=cfg.equalized_lr,
                init_bias_to_zero=cfg.init_bias_to_zero)
            params_D = init_discriminator_params(
                rng_d, depths=cfg.depths, scale=scale,
                input_dim=cfg.input_dim,
                decision_layer_size=cfg.decision_layer_size,
                apply_minibatch_norm=cfg.apply_minibatch_norm,
                equalized_lr=cfg.equalized_lr,
                init_bias_to_zero=cfg.init_bias_to_zero)
            return params_G, params_D

        params_G, params_D = _init(self._rng_G, self._rng_D)
        self._fresh_state(params_G, params_D, self._rng_state)

    @property
    def _ema_enabled(self) -> bool:
        """G weight smoothing (PGGAN paper §A.1) — `g_ema_decay` > 0.
        Off by default: the reference has no EMA (parity)."""
        return ("g_ema_decay" in self.cfg
                and float(self.cfg["g_ema_decay"]) > 0.0)

    def _fresh_state(self, params_G, params_D, rng, params_G_ema=None):
        # NOTE: rng must be threaded explicitly — with donate_buffers the
        # step invalidates every array in the previous TrainState, so any
        # buffer captured at __init__ is dead after the first step.
        self.opt_g, self.opt_d = make_optimizers(self.cfg)
        state = init_train_state(jax.numpy.asarray(rng), params_G, params_D,
                                 self.opt_g, self.opt_d, params_G_ema,
                                 ema=self._ema_enabled)
        self.state = replicate(state, self.mesh)
        self._fid_sampler = None        # new pytree structure → new program
        self._val_fn = None
        self._eval_ds = None
        self._rate_anchor = None        # per-scale batch may change

    def set_optimizers(self):
        """Fresh Adam state for the CURRENT params (`lib/model.py:95-97`;
        called standalone it re-initializes moments like `reset_solver`)."""
        if self.state is None:
            return
        self._fresh_state(self.state.params_G, self.state.params_D,
                          self.state.rng, self.state.params_G_ema)

    def set_dataset(self):
        """Dataset at the current scale's resolution + 70/30 split
        (`pggan/model.py:118-126`)."""
        self.dataset = build_dataset(self.cfg, self.schedule.scale_index,
                                     is_master=self.is_master)
        self._train_indices, self._valid_indices = split_dataset(
            len(self.dataset), 0.7, seed=int(self.cfg.seed))
        # The validation pipeline caches the OLD dataset (old resolution,
        # old split) — a scale jump must invalidate it or validation()
        # would feed stale-resolution batches into the grown D and crash.
        if self._valid_pipeline is not None:
            self._valid_pipeline.close()
            self._valid_pipeline = None

    def set_data_iterator(self):
        if self._pipeline is not None:
            self._pipeline.close()
        batch = self.local_batch_size
        mesh = self.mesh
        impl = str(self.cfg["data_backend_impl"]) \
            if "data_backend_impl" in self.cfg else "threads"
        pipeline_cls = DataPipeline
        if impl == "grain":
            from pggan_tpu.data.grain_pipeline import GrainPipeline
            pipeline_cls = GrainPipeline
        # chunked dispatch drains `steps_per_dispatch` batches at once;
        # deepen the prefetch queue so the producer can run ahead while
        # the device executes the chunk
        depth = max(int(self.cfg.prefetch_depth),
                    resolve_steps_per_dispatch(
                        self.cfg, self.schedule.scale_index) + 1)
        # Exact-resume fast-forward: every step consumes exactly one batch
        # from the per-scale stream (a k-chunk consumes k), so the batches
        # already drawn at this scale = steps completed since the scale
        # started. At a fresh scale jump this is 0 (global_step == the
        # jump step); after a resume it re-positions the deterministic
        # stream where the interrupted run left it — with the restored
        # checkpoint `rng`, the continuation is bit-identical to the
        # uninterrupted run (tests/test_preemption.py pins this).
        sched = self.schedule
        scale_start = (sched.next_scale_jump_step
                       - int(sched.max_step_at_scale[sched.scale_index]))
        # HBM-resident dataset (`data/device_cache.py`): rebuilt per scale
        # (the cache holds resized-at-scale images); freed before the new
        # upload. Only the thread pipeline takes the hook — grain's record
        # stream stays a host pipeline.
        assemble_fn = None
        self._device_cache = None
        if pipeline_cls is DataPipeline:
            from pggan_tpu.data.device_cache import (DeviceDataCache,
                                                     resolve_device_data_cache)
            if resolve_device_data_cache(self.cfg, self.dataset, mesh):
                self._device_cache = DeviceDataCache(self.dataset, mesh)
                assemble_fn = self._device_cache.assemble
                if self.is_master:
                    print(f"[pggan_tpu] device data cache: "
                          f"{self._device_cache.n_images} images, "
                          f"{self._device_cache.nbytes / 1e6:.1f} MB in HBM")
        self._pipeline = pipeline_cls(
            self.dataset, batch,
            indices=self._train_indices,
            num_workers=int(self.cfg.num_data_workers),
            prefetch_depth=depth,
            seed=int(self.cfg.seed) + self.schedule.scale_index,
            shard_fn=lambda b: shard_batch(b, mesh),
            rank=jax.process_index(), num_replicas=jax.process_count(),
            start_batch=max(0, self.global_step - scale_start),
            **({"assemble_fn": assemble_fn}
               if pipeline_cls is DataPipeline else {}))

    def set_loss_collector(self):
        max_step = min(sum(self.cfg.max_step_at_scale), self.cfg.max_step)
        self.loss_collector = LossCollector(max_step)

    @property
    def local_batch_size(self) -> int:
        """This host's share of the global batch."""
        g = global_batch_size(self.cfg, self.mesh, self.schedule.scale_index)
        return max(1, g // jax.process_count())

    # -- schedule ------------------------------------------------------------
    def check_jump(self, global_step: int) -> Dict[str, bool]:
        jumps = self.schedule.check_jump(global_step)
        if jumps["scale_jumped"]:
            self._grow()
        return jumps

    def _grow(self):
        """Scale jump: grow pytrees + reset solver + new compiled step
        (`change_scale` + `reset_solver`, `pggan/model.py:131-174`)."""
        cfg = self.cfg
        params_G = grow_generator_params(
            self.state.params_G, self._rng_G, depths=cfg.depths,
            output_dim=cfg.output_dim, equalized_lr=cfg.equalized_lr,
            init_bias_to_zero=cfg.init_bias_to_zero)
        params_D = grow_discriminator_params(
            self.state.params_D, self._rng_D, depths=cfg.depths,
            input_dim=cfg.input_dim, equalized_lr=cfg.equalized_lr,
            init_bias_to_zero=cfg.init_bias_to_zero)
        params_G_ema = None
        if self.state.params_G_ema is not None:
            # Same deterministic rng folding as params_G's growth: the new
            # block starts IDENTICAL in both trees (average == value for a
            # brand-new block), old leaves keep their running average.
            params_G_ema = grow_generator_params(
                self.state.params_G_ema, self._rng_G, depths=cfg.depths,
                output_dim=cfg.output_dim, equalized_lr=cfg.equalized_lr,
                init_bias_to_zero=cfg.init_bias_to_zero)
        self._fresh_state(params_G, params_D, self.state.rng, params_G_ema)
        self.set_dataset()
        self.set_data_iterator()
        self._build_step_fn()

    def _build_step_fn(self):
        cfg = self.cfg
        interval = int(cfg["r1_interval"]) if "r1_interval" in cfg else 1
        self._r1_interval = interval if str(cfg.loss_mode) == "r1" else 1
        # Lazy R1 runs through r1-leading dispatch WINDOWS (StyleGAN2 §5.1
        # cadence made structural): each window is one compiled program —
        # sub-step 0 applies the penalty scaled by the window length, the
        # scanned tail doesn't. Programs are cached per window length
        # (boundary-truncated windows are shorter; each length is its own
        # shape-distinct executable). The single-step program for k=1
        # windows is the include_r1=True static twin at weight ×1 — an
        # isolated window applies the penalty once at unit weight, keeping
        # the time-average regularization exactly γ. The runtime-cond
        # alternative was measured SLOWER than every-step R1 (grad-of-cond
        # union residuals; make_train_step docstring) — windows are the
        # production path.
        self._lazy_chunk_fns = {}
        if self._r1_interval > 1:
            self._step_fn = make_train_step(
                cfg, self.schedule.scale_index, self.opt_g, self.opt_d,
                include_r1=True, r1_scale=1.0)
        else:
            self._step_fn = make_train_step(
                cfg, self.schedule.scale_index, self.opt_g, self.opt_d)
        # Step chunking (steps_per_dispatch): run k steps per dispatched
        # program inside event-free schedule windows — amortizes the
        # per-step host→device round trip that dominates small scales
        # end-to-end (make_chunked_train_step docstring / BASELINE.md).
        self._chunk_size = resolve_steps_per_dispatch(
            cfg, self.schedule.scale_index)
        if self._chunk_size > 1 and self._r1_interval > 1:
            # Lazy R1 dispatches its OWN windows (length = r1_interval,
            # truncated at host-action boundaries — _chunk_window), so an
            # explicit steps_per_dispatch would be a second, conflicting
            # window spec; 'auto' quietly defers to the lazy windows, an
            # EXPLICIT request must not be silently reinterpreted.
            if cfg["steps_per_dispatch"] != "auto":
                raise ValueError(
                    "steps_per_dispatch > 1 is incompatible with "
                    "r1_interval > 1 (lazy R1 dispatches its own "
                    "r1_interval-length windows); use "
                    "steps_per_dispatch: auto or r1_interval: 1")
            self._chunk_size = 1
        if self._chunk_size > 1:
            self._chunk_fn = make_chunked_train_step(
                cfg, self.schedule.scale_index, self.opt_g, self.opt_d,
                self._chunk_size)
        else:
            self._chunk_fn = None

    # -- the hot loop ---------------------------------------------------------
    def load_next_batch(self):
        return next(self._pipeline)

    def train_step(self) -> Tuple[Any, Any]:
        """One fused D+G iteration; returns (img_real_faded, img_fake) for
        the periodic sample grid (`pggan/model.py:206-255`)."""
        batch = self.load_next_batch()
        alpha = jnp.float32(self.schedule.alpha)
        # lazy R1: a single step is a k=1 window — the ×1-weight R1
        # program (see _build_step_fn); cadence lives in _chunk_window
        self.state, metrics, images = self._step_fn(self.state, batch, alpha)
        self._last_metrics = metrics
        return images

    def train_chunk(self, n_steps: int) -> Tuple[Any, Any]:
        """`n_steps` fused iterations in ONE dispatched program
        (make_chunked_train_step). Only called from event-free windows
        (_chunk_window), where alpha is constant and no host action falls
        between the chunk's steps."""
        batches = [self.load_next_batch() for _ in range(n_steps)]
        alpha = jnp.float32(self.schedule.alpha)
        if self._r1_interval > 1:
            fn = self._lazy_chunk_fns.get(n_steps)
            if fn is None:
                fn = make_chunked_train_step(
                    self.cfg, self.schedule.scale_index, self.opt_g,
                    self.opt_d, n_steps, r1_leading=True)
                self._lazy_chunk_fns[n_steps] = fn
        else:
            fn = self._chunk_fn
        self.state, metrics, images = fn(self.state, batches, alpha)
        self._last_metrics = metrics
        return images

    def _chunk_window(self, step: int, total: int) -> int:
        """Return self._chunk_size when steps [step, step+k) contain NO
        host-action boundary — no log/image/validation/FID/checkpoint
        cycle hit, no scale or alpha jump, not past `total` — else 1.
        All-or-nothing (no variable-length chunks): each distinct chunk
        length would compile its own program.

        Lazy R1 (`r1_interval > 1`) instead uses VARIABLE windows: the
        window runs from `step` to the first host-action boundary, capped
        at `r1_interval` — every window leads with the penalty sub-step,
        scaled ×k, so the cadence is the window structure itself. Distinct
        lengths DO compile their own programs, but recipe boundary
        arithmetic keeps the set tiny (e.g. alpha jumps every 50 steps
        with interval 16 yield k ∈ {16, 1}), and each is persistent-cached.
        The window function is memoryless in `step`, so a checkpoint
        resume reproduces the exact window (and therefore cadence)
        sequence — bit-exact replay holds (tests/test_preemption.py)."""
        lazy = self._r1_interval > 1
        k = self._r1_interval if lazy else self._chunk_size
        if lazy:
            k = min(k, total - step)
        elif self._chunk_fn is None or k < 2 or step + k > total:
            return 1
        if k < 1:
            return 1
        cfg = self.cfg
        cycles = [int(cfg.loss_cycle), int(cfg.test_cycle),
                  int(cfg.ckpt_cycle)]
        if cfg.fid_cycle:
            cycles.append(int(cfg.fid_cycle))
        jumps = (self.schedule.next_scale_jump_step,
                 self.schedule.next_alpha_jump_step)
        for u in range(step, step + k):
            if any(c > 0 and u % c == 0 for c in cycles) or u in jumps:
                if not lazy:
                    return 1
                k = max(u - step, 1)     # truncate at the boundary
                break
        return k

    def fit(self, run_id: Optional[str] = None, *, max_step: Optional[int] = None):
        """The full training loop (`train.py:39-66`) with preemption
        handling: SIGTERM/SIGINT checkpoint the full state (params, opt
        moments, schedule) before exiting, so a restart with
        `--ckpt_id {run_id}` resumes exactly — the failure-recovery
        capability the reference lacks (SURVEY.md §5: its only resilience
        is a try/except that then crashes)."""
        import signal

        cfg = self.cfg
        if run_id is not None:
            cfg.run_id = run_id
        if self.logger is None and self.is_master:
            self.logger = MetricLogger(cfg.save_root, cfg.run_id,
                                       model_id=cfg.model_id,
                                       use_wandb=bool(cfg.use_wandb))
        total = min(sum(cfg.max_step_at_scale), cfg.max_step)
        if max_step is not None:
            total = min(total, max_step)

        interrupted = {"flag": False}

        def _on_signal(signum, frame):
            interrupted["flag"] = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:       # non-main thread
                pass

        start_step = self.global_step
        step = start_step
        self._rate_anchor = (time.time(), step)
        try:
            while step < total and not interrupted["flag"]:
                # Periodic checkpoint BEFORE the step runs: the saved state
                # contains exactly `step` completed updates, so a resume at
                # `step` replays nothing. (The reference saves after the
                # step under the same label, `train.py:63-64`, silently
                # re-executing one update per resume — documented fix.)
                if step % cfg.ckpt_cycle == 0 and step != start_step:
                    self.save_checkpoint(step)
                self.check_jump(step)
                chunk = self._chunk_window(step, total)
                if chunk > 1:
                    # k steps, one dispatch; no host action falls inside
                    # the window, so every cycle/jump below still fires at
                    # exactly its reference step (they land on steps the
                    # window excluded).
                    self._chunks_dispatched += 1
                    images = self.train_chunk(chunk)
                    step += chunk
                    self.global_step = step
                    continue
                images = self.train_step()

                if self.is_master and step % cfg.loss_cycle == 0:
                    self.loss_collector.update(self._last_metrics)
                    now = time.time()
                    # _rate_anchor resets at scale jumps (_fresh_state),
                    # so the window never straddles a batch-size change
                    if self._rate_anchor and step > self._rate_anchor[1]:
                        t0, s0 = self._rate_anchor
                        rate = ((step - s0) * self.local_batch_size *
                                jax.process_count() / (now - t0))
                        self.loss_collector.loss_dict["imgs_per_sec"] = \
                            round(rate, 1)
                    self._rate_anchor = (now, step)
                    self.logger.log(step, self.loss_collector.loss_dict)
                    self.loss_collector.print_loss(step)
                # Evaluation hooks run on EVERY process — the compute is
                # SPMD over the global mesh (a master-only call would hang
                # multi-host runs waiting on the other processes); only the
                # logging inside is master-gated.
                if step % cfg.test_cycle == 0:
                    if self.is_master:
                        self.save_image(images, step)
                    if cfg.use_validation:
                        self.validation(step)
                if cfg.fid_cycle and step % cfg.fid_cycle == 0 and step:
                    gm = self.compute_generative_metrics()
                    if self.is_master:
                        self.logger.log(step, gm)
                        print(f"step {step}: FID = {gm['fid']:.2f}  "
                              f"KID = {gm['kid']:.5f}")
                step += 1
                self.global_step = step
            self.save_checkpoint(step, wait=True)
            if self.is_master and interrupted["flag"]:
                print(f"[pggan_tpu] interrupted at step {step}; state "
                      f"checkpointed — resume with --ckpt_id {cfg.run_id}")
        finally:
            for sig, handler in prev_handlers.items():
                # handler is None when a non-Python (C-level) handler was
                # installed — leave it untouched rather than stomping it
                if handler is not None:
                    signal.signal(sig, handler)
        return self

    # -- io -------------------------------------------------------------------
    def save_image(self, images, step: int):
        from pggan_tpu.parallel.mesh import local_numpy
        real, fake = images
        # local_numpy: on multi-host the grid shows this process's shard
        # (global batch-sharded arrays are not host-materializable).
        # At hires_pack the step returns images PACKED [B,R/2,R/2,12]
        # (unpacking device-side on every step cost ~14 ms for outputs
        # read once per image_cycle); undo the space-to-depth here.
        from pggan_tpu.train.step import resolve_hires_pack
        packed = resolve_hires_pack(self.cfg, self.schedule.scale_index) >= 1
        save_image_grid(self.cfg.save_root, self.cfg.run_id, step, "imgs",
                        [_unpack_image_np(local_numpy(real), packed),
                         _unpack_image_np(local_numpy(fake), packed)])

    def validation(self, step: int):
        """Multi-batch held-out evaluation — the reference declares a
        validation split then leaves `validation()` as `pass`
        (`pggan/model.py:260-261`); this makes it real: `val_batches`
        held-out batches through D (real side), a matched number of
        fixed-seed generator samples through D (fake side), and the
        adversarial losses on those logits, averaged and logged as
        `val_*` metrics (the legacy `valid_D_real` name is kept as an
        alias). Training-only regularizers (R1 / GP / drift) are excluded
        — they measure gradient geometry, not held-out fit.

        Multi-host: every process calls this (fit does); real batches are
        globally sharded via the pipeline's shard_fn, latents are
        fixed-seed (process-identical), and the jitted eval executes SPMD,
        so the scalar means come out replicated — only the master logs.
        """
        if self._valid_indices is None or len(self._valid_indices) == 0:
            return
        cfg = self.cfg
        if self._valid_pipeline is None:
            self._valid_pipeline = DataPipeline(
                self.dataset, self.local_batch_size,
                indices=self._valid_indices, num_workers=2,
                prefetch_depth=1, seed=7,
                shard_fn=lambda b: shard_batch(b, self.mesh),
                rank=jax.process_index(), num_replicas=jax.process_count())
        if self._val_fn is None:    # cached per scale (_fresh_state resets)
            from pggan_tpu.models import discriminator_apply, generator_apply
            from pggan_tpu.losses.gan import bce_with_logits, generator_loss
            from pggan_tpu.ops import downscale2d, upscale2d
            from pggan_tpu.train.step import resolve_hires_pack
            compute_dtype = (jnp.bfloat16
                             if str(cfg.compute_dtype) == "bfloat16"
                             else jnp.float32)
            # Mirror the train step's packed execution at hires_pack
            # scales (step.py packed_imgs): G emits packed, D consumes
            # packed, the real fade runs as channel-group ops — the
            # validation forward otherwise rebuilds the unpacked ≥512²
            # program whose layout copies packing exists to avoid.
            hp = resolve_hires_pack(cfg, self.schedule.scale_index)
            packed = hp >= 1
            d_kw = dict(slope=float(cfg.LReLU_slope),
                        apply_minibatch_norm=bool(cfg.apply_minibatch_norm),
                        compute_dtype=compute_dtype,
                        hires_pack=hp, input_packed=packed)
            g_kw = dict(slope=float(cfg.LReLU_slope),
                        apply_pixel_norm=bool(cfg.apply_pixel_norm),
                        last_activation=cfg.generator_last_activation,
                        fused_scale=cfg.fused_scale,
                        compute_dtype=compute_dtype,
                        hires_pack=hp, output_packed=packed)
            w_adv = float(cfg.W_adv)
            fade_real = self.schedule.scale_index > 0

            def _eval(params_G, params_D, real, z, alpha):
                if packed:
                    from pggan_tpu.ops.packed import (downscale2d_packed,
                                                      space_to_depth2,
                                                      upscale2d_packed)
                    real = space_to_depth2(real)
                    low = upscale2d_packed(downscale2d_packed(real))
                    real = (1.0 - alpha) * low + alpha * real
                elif fade_real:
                    # evaluate D on the SAME real distribution training
                    # feeds it: the alpha-blended fade
                    # (pggan/model.py:217-221 / step.py real fade-in) —
                    # un-faded reals would make val_L_D diverge from the
                    # held-out analog of L_D during every fade
                    low = upscale2d(downscale2d(real, 2), 2)
                    real = (1.0 - alpha) * low + alpha * real
                logit_real = discriminator_apply(params_D, real, alpha,
                                                 **d_kw)
                fake = generator_apply(params_G, z, alpha, **g_kw)
                logit_fake = discriminator_apply(params_D, fake, alpha,
                                                 **d_kw)
                # both loss modes use BCE adversarial terms
                # (pggan/loss.py:16-27, 54-66)
                l_d = (bce_with_logits(logit_real, 1)
                       + bce_with_logits(logit_fake, 0))
                l_g = generator_loss(logit_fake, w_adv)
                return (jnp.mean(logit_real.astype(jnp.float32)),
                        jnp.mean(logit_fake.astype(jnp.float32)), l_d, l_g)

            self._val_fn = jax.jit(_eval)
        n_batches = max(1, int(cfg["val_batches"])
                        if "val_batches" in cfg else 4)
        alpha = jnp.float32(self.schedule.alpha)
        # fixed eval latent stream: val curves stay comparable across
        # calls/resumes (folded per scale so fakes match the current res)
        base = jax.random.fold_in(jax.random.PRNGKey(int(cfg.seed) + 999),
                                  self.schedule.scale_index)
        totals = np.zeros(4, np.float64)
        for b in range(n_batches):
            batch = next(self._valid_pipeline)
            real = jnp.asarray(batch, jnp.float32) / 127.5 - 1.0
            z = jax.random.normal(jax.random.fold_in(base, b),
                                  (real.shape[0], int(cfg.latent_dim)))
            out = self._val_fn(self.state.params_G, self.state.params_D,
                               real, z, alpha)
            totals += np.asarray(jax.device_get(out), np.float64)
        totals /= n_batches
        if self.logger is not None:
            self.logger.log(step, {
                "val_D_real": float(totals[0]),
                "val_D_fake": float(totals[1]),
                "val_L_D": float(totals[2]),
                "val_L_G": float(totals[3]),
                "valid_D_real": float(totals[0]),       # legacy alias
            })

    def _eval_dataset(self):
        """Un-augmented twin of the training dataset (FID reals must not be
        color-jittered/flipped)."""
        if self._eval_ds is None or \
                getattr(self._eval_ds, "resolution", None) != self.schedule.resolution:
            from pggan_tpu.data.dataset import ImageFolderDataset, SyntheticDataset
            if isinstance(self.dataset, ImageFolderDataset):
                # Honor the run's cache policy — a second default-budget
                # cache would double host memory (and ignore an explicit
                # cache_decoded: false set to avoid exactly that).
                cfg = self.cfg
                self._eval_ds = ImageFolderDataset(
                    [], self.schedule.scale_index, augment=False,
                    paths=self.dataset.paths,
                    cache_decoded=(cfg["cache_decoded"]
                                   if "cache_decoded" in cfg else "auto"),
                    decode_cache_mb=(int(cfg["decode_cache_mb"])
                                     if "decode_cache_mb" in cfg else 8192))
            else:
                self._eval_ds = self.dataset      # synthetic: no augmentation
        return self._eval_ds

    def _fid_extractor(self):
        """FID feature extractor per config: `fid_extractor` =
        'random_conv' (default — deterministic, relative values) or
        'inception' (canonical InceptionV3 pool3; pass `fid_weights` =
        path to a converted npz for true Inception-FID comparability —
        metrics/inception.py documents the torchvision conversion).
        Cached: Inception init is ~24M parameters + an npz read —
        rebuilding per fid_cycle would be pure repeated work. (The
        extractor is resolution-independent, so unlike _fid_sampler it
        survives scale jumps.)"""
        if self._fid_extractor_cache is not None:
            return self._fid_extractor_cache
        kind = str(self.cfg["fid_extractor"]) \
            if "fid_extractor" in self.cfg else "random_conv"
        if kind == "inception":
            from pggan_tpu.metrics import InceptionV3Features
            weights = self.cfg["fid_weights"] if "fid_weights" in self.cfg else None
            extractor = InceptionV3Features(weights=weights)
        else:
            from pggan_tpu.metrics import RandomConvFeatures
            extractor = RandomConvFeatures(feature_dim=256)
        self._fid_extractor_cache = extractor
        return extractor

    def compute_fid(self, num_samples: Optional[int] = None) -> float:
        """FID only — see `compute_generative_metrics` for the full set."""
        return self.compute_generative_metrics(num_samples)["fid"]

    def compute_generative_metrics(self, num_samples: Optional[int] = None
                                   ) -> dict:
        """Generative-quality metrics between generated samples and
        held-out (un-augmented) reals at the current scale, from ONE
        feature-extraction pass through the configured extractor
        (random-conv default, or InceptionV3 — see `_fid_extractor`):

          * `fid` — Fréchet distance between feature Gaussians. The
            reference publishes no metric code (README.md:22-24 stub);
            BASELINE.json names FID as the quality criterion.
          * `kid` / `kid_std` — unbiased kernel MMD² (metrics/kid.py).
            FID's level is bias-dominated at the n=29 reals this
            environment ships; KID's unbiased estimator makes the level
            meaningful at small n, which is why both are logged.

        Multi-host: every process calls this (fit does). All inputs are
        process-identical (fixed-seed latents, fixed-seed real-index
        draws), params are replicated over the global mesh, so the jitted
        sampler/extractor run SPMD and their fully-replicated outputs are
        host-readable on every process — the statistics and the distances
        come out identical everywhere.
        """
        from pggan_tpu.metrics import (compute_activations,
                                       frechet_distance,
                                       kid_between_features)

        cfg = self.cfg
        n = int(num_samples or cfg.fid_samples)
        batch = max(8, min(64, self.local_batch_size, n))
        # Evaluate the SMOOTHED generator when EMA is on (the PGGAN
        # paper's eval convention); the raw training G otherwise.
        params_G = (self.state.params_G_ema
                    if self.state.params_G_ema is not None
                    else self.state.params_G)
        alpha = jnp.float32(self.schedule.alpha)

        if self._fid_sampler is None:      # cached per scale (_fresh_state resets)
            from pggan_tpu.models import generator_apply
            from pggan_tpu.train.step import resolve_hires_pack
            # Same packed program shape as the train step at ≥512²
            # (hires_pack) — the unpacked G forward is exactly the
            # layout-copy pathology packing exists to avoid, and building
            # it for eval would add a second per-scale compile at the
            # marquee scales. Host unpacks the [B,R/2,R/2,12] output
            # (trivial numpy transpose, off the device).
            hp = resolve_hires_pack(cfg, self.schedule.scale_index)
            self._fid_sampler_packed = hp >= 1
            self._fid_sampler = jax.jit(lambda p, z, a: generator_apply(
                p, z, a, slope=float(cfg.LReLU_slope),
                apply_pixel_norm=bool(cfg.apply_pixel_norm),
                last_activation=cfg.generator_last_activation,
                fused_scale=cfg.fused_scale,
                hires_pack=hp, output_packed=hp >= 1))
        sample = self._fid_sampler
        sample_packed = self._fid_sampler_packed

        rng = jax.random.PRNGKey(int(cfg.seed) + 777)

        def fake_batches():
            nonlocal rng
            done = 0
            while done < n:
                rng, key = jax.random.split(rng)
                z = jax.random.normal(key, (batch, int(cfg.latent_dim)))
                img = _unpack_image_np(
                    np.asarray(sample(params_G, z, alpha)), sample_packed)
                yield np.clip(img, -1.0, 1.0)
                done += batch

        eval_ds = self._eval_dataset()

        def real_batches():
            if (self._valid_indices is not None
                    and len(self._valid_indices) >= batch):
                indices = self._valid_indices
            else:
                indices = self._train_indices
                if self.is_master:
                    print("[pggan_tpu] FID reals: valid split smaller than "
                          "one batch — falling back to train indices")
            rs = np.random.RandomState(0)
            # each unique real at most ONCE: resampling with replacement
            # to n duplicated rows, which biases KID's within-real sum
            # (identical off-diagonal pairs inflate k_rr — the estimator
            # is only unbiased over distinct draws) and collapsed its
            # subset error bar (both sides at n → single evaluation,
            # kid_std 0); FID's mean/cov need no fixed count either
            sel_all = (np.asarray(indices) if len(indices) <= n
                       else rs.choice(indices, size=n, replace=False))
            for start in range(0, len(sel_all), batch):
                sel = sel_all[start:start + batch]
                yield np.stack([
                    eval_ds.get(int(i), np.random.RandomState(int(i)))
                    for i in sel])

        extractor = self._fid_extractor()
        f_real = compute_activations(real_batches(), extractor,
                                     max_samples=n)
        f_fake = compute_activations(fake_batches(), extractor,
                                     max_samples=n)
        mu_r, sig_r = f_real.mean(0), np.cov(f_real, rowvar=False)
        mu_f, sig_f = f_fake.mean(0), np.cov(f_fake, rowvar=False)
        kid, kid_std = kid_between_features(f_real, f_fake)
        return {"fid": frechet_distance(mu_r, sig_r, mu_f, sig_f),
                "kid": kid, "kid_std": kid_std}

    def save_checkpoint(self, global_step: int, *, wait: bool = False):
        """Params + optimizer state + schedule + args, per net
        (`pggan/model.py:50-67`).

        Async by design (the orbax-async analog): the pytrees are
        device-copied (fast HBM copy — safe against buffer donation by the
        next step), then the device→host transfer and npz write run on a
        background thread so the training loop never stalls on checkpoint
        I/O. `wait=True` (final save / tests) blocks until durable.

        Multi-host: EVERY process must call this (the snapshot copy is an
        SPMD program over the global mesh; `fit` does so) — only process 0
        writes files. Params/opt state are fully replicated, so the host
        transfer is process-local.
        """
        meta = {
            "args": self.cfg.to_dict(),
            "schedule": self.schedule.state_dict(),
            # Post-step RNG key: restoring it makes resume replay the SAME
            # latent/eps stream it would have produced uninterrupted —
            # without it a resumed run restarts the stream from the seed.
            "rng": np.asarray(jax.device_get(self.state.rng)).tolist(),
        }
        # Device-side snapshot: new buffers, immune to donation of the
        # live state by subsequent steps. Runs on all processes (SPMD).
        snapshot = jax.tree.map(
            lambda x: jnp.copy(x),
            ((self.state.params_G, self.state.opt_state_G),
             (self.state.params_D, self.state.opt_state_D),
             self.state.params_G_ema))
        if not self.is_master:
            return

        def _write():
            (p_g, o_g), (p_d, o_d), p_ema = snapshot
            for name, params, opt_state in (("G", p_g, o_g), ("D", p_d, o_d)):
                ckpt_lib.save_checkpoint(
                    self.cfg.save_root, self.cfg.run_id, name, global_step,
                    params=params, opt_state=opt_state, meta=meta)
            if p_ema is not None:      # smoothed-G eval weights (params only)
                ckpt_lib.save_checkpoint(
                    self.cfg.save_root, self.cfg.run_id, "Gema", global_step,
                    params=p_ema, meta=meta)

        if self._ckpt_future is not None:
            self._ckpt_future.result()      # serialize saves, surface errors
        self._ckpt_future = self._ckpt_pool.submit(_write)
        if wait:
            self._ckpt_future.result()
            self._ckpt_future = None

    def load_checkpoint(self):
        """Restore args + schedule, re-grow both nets to the saved scale,
        then load weights and optimizer moments (`pggan/model.py:70-101`,
        with the depth off-by-one fixed: growth uses depths[1..s])."""
        cfg = self.cfg
        loaded = {}
        for name in ("G", "D"):
            result = ckpt_lib.load_checkpoint(
                cfg.save_root, cfg.ckpt_id, name, cfg.ckpt_step)
            if result is None:
                raise FileNotFoundError(
                    f"checkpoint {name} not found for ckpt_id={cfg.ckpt_id!r} "
                    f"step={cfg.ckpt_step!r} under {cfg.save_root!r}")
            loaded[name] = result
        # The per-net saves are individually atomic but the SET is not: a
        # kill between G's and D's `latest` refresh leaves aliases from
        # different steps. Loudly refuse a mixed pair instead of silently
        # training a G/D trained ckpt_cycle steps apart.
        steps = {name: int(loaded[name][2]["global_step"]) for name in loaded}
        if len(set(steps.values())) != 1:
            raise RuntimeError(
                f"checkpoint step mismatch across nets: {steps} — the run "
                f"was likely killed mid-save; resume from an explicit "
                f"consistent step (--ckpt_step {min(steps.values())})")

    # args restore, preserving run-local keys (`lib/model_loader.py:26-31`)
    # plus the resume target itself: the snapshotted args carry the
    # ORIGINAL run's ckpt_id/ckpt_step (usually null), and letting them
    # clobber this run's would break any post-update load (the Gema read
    # below) and make load_checkpoint non-idempotent.
        meta = loaded["G"][2]
        # Run-local keys always survive; beyond them, any key the user
        # EXPLICITLY passed for this resume run (yaml / CLI) overrides the
        # snapshot — e.g. resuming with `g_ema_decay: 0.999` actually turns
        # EMA on (previously the snapshotted 0.0 silently clobbered it),
        # and a changed lr/loss_mode takes effect. Defaults defer to the
        # snapshot as before.
        preserve_keys = (set(("run_id", "dataset_root_list",
                              "ckpt_id", "ckpt_step"))
                         | set(getattr(cfg, "explicit_keys", frozenset)()))
        preserved = {k: cfg[k] for k in preserve_keys if k in cfg}
        cfg.update(meta.get("args", {}))
        for k, v in preserved.items():
            cfg[k] = v
        cfg.isMaster = self.is_master

        # Rebuild the schedule from the RESTORED cfg before loading its
        # scalar state: the per-scale lists (max_step_at_scale,
        # alpha_jump_*) may have been restored from the snapshot (or
        # explicitly overridden), and the schedule constructed at __init__
        # still holds the pre-restore lists — future jumps/fades would
        # silently use the wrong durations.
        self.schedule = ProgressiveSchedule.from_config(cfg, verbose=False)
        self.schedule.load_state_dict(meta["schedule"])
        self.global_step = int(meta["global_step"])

        # Re-grow to the saved scale, then rebuild solver state.
        self.initialize_models()   # builds at schedule.scale_index directly
        self.set_dataset()
        self.set_data_iterator()

        template_state = self.state
        params_G = ckpt_lib.arrays_to_tree(template_state.params_G, loaded["G"][0])
        params_D = ckpt_lib.arrays_to_tree(template_state.params_D, loaded["D"][0])
        opt_G = ckpt_lib.arrays_to_tree(template_state.opt_state_G, loaded["G"][1])
        opt_D = ckpt_lib.arrays_to_tree(template_state.opt_state_D, loaded["D"][1])
        rng = template_state.rng
        if "rng" in meta:       # exact-resume RNG stream (older ckpts lack it)
            rng = jnp.asarray(np.asarray(meta["rng"], dtype=np.uint32))
        params_G_ema = None
        if self._ema_enabled:
            ema_loaded = ckpt_lib.load_checkpoint(
                cfg.save_root, cfg.ckpt_id, "Gema", cfg.ckpt_step)
            if ema_loaded is not None:
                ema_step = int(ema_loaded[2]["global_step"])
                if ema_step != self.global_step:
                    # same mixed-set hazard as the G/D check above: a kill
                    # between D's and Gema's latest refresh must not
                    # silently serve a stale EMA stream
                    raise RuntimeError(
                        f"Gema checkpoint step {ema_step} != G/D step "
                        f"{self.global_step} — resume from an explicit "
                        f"consistent step (--ckpt_step {ema_step})")
                params_G_ema = ckpt_lib.arrays_to_tree(params_G,
                                                       ema_loaded[0])
            else:               # EMA turned on mid-run: seed from params
                params_G_ema = jax.tree.map(jnp.copy, params_G)
        self.state = replicate(
            TrainState(params_G, params_D, opt_G, opt_D, rng, params_G_ema),
            self.mesh)
        if self.is_master:
            print(f"checkpoint {cfg.ckpt_id}@{meta['global_step']} restored "
                  f"(scale={self.schedule.scale_index}, "
                  f"alpha={self.schedule.alpha})")

    def close(self):
        if self._ckpt_future is not None:
            try:
                self._ckpt_future.result()
            except Exception as exc:
                print(f"[pggan_tpu] async checkpoint failed: {exc!r}")
            self._ckpt_future = None
        self._ckpt_pool.shutdown(wait=True)
        if self._pipeline is not None:
            self._pipeline.close()
        if self._valid_pipeline is not None:
            self._valid_pipeline.close()
        if self.logger is not None:
            self.logger.close()
