"""Training loop orchestration: epochs, save/val cadence, resume, logging.

Mirrors the reference's train() drivers (encoder.py:300-356,
decoder.py:379-444): stream batches from a window sampler, one jitted step
per batch, epoch counter increments every ``steps_per_epoch`` (driving the
lr decay and the f_mel schedule), save + validate every
``save_each_n_epochs``. Adds what the reference lacked: auto-resume from the
latest checkpoint at startup, double-buffered device prefetch, steps/sec
telemetry, and non-interactive operation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import numpy as np


def _fuse_steps(train_step: Callable, k: int, n_bind: int = 0) -> Callable:
    """(ts, *stacked_batch[k, ...], *bind) -> (ts, last-substep metrics): k
    optimizer steps inside one compiled program via lax.scan — one host
    dispatch. The trailing ``n_bind`` args are scan-invariant extras (e.g.
    device-resident dataset arrays) forwarded to every substep."""
    import jax

    def fused(ts, *args):
        stacked = args[: len(args) - n_bind] if n_bind else args
        bind = args[len(args) - n_bind:] if n_bind else ()

        def body(t, batch):
            return train_step(t, *batch, *bind)

        ts2, ms = jax.lax.scan(body, ts, stacked)
        return ts2, jax.tree.map(lambda a: a[-1], ms)

    return fused


def _stack_iter(batches: Iterator, k: int, pending: list,
                seen: dict | None = None) -> Iterator:
    """Group k consecutive batches into one stacked macro-batch. ``pending``
    persists across calls so a sampler pass shorter than k carries its
    batches into the next pass instead of losing them."""
    for b in batches:
        if seen is not None:
            seen["n"] += 1
        pending.append(b)
        if len(pending) == k:
            yield tuple(np.stack(col) for col in zip(*pending))
            pending.clear()


def _stacked_sharding(sharding, k: int):
    """Batch sharding for [k, B, ...] macro-batches: keep the scan axis
    replicated, shard the batch axis as before."""
    if sharding is None or k == 1:
        return sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(sharding.mesh, P(None, *sharding.spec))


from ..data.prefetch import device_prefetch
from ..runtime.checkpoint import Checkpointer
from ..runtime.logging import MetricsWriter, StepTimer
from .optimizer import next_epoch


@dataclasses.dataclass
class LoopConfig:
    n_epochs: int = 99999
    steps_per_epoch: int = 100
    save_each_n_epochs: int = 3
    log_every_steps: int = 20
    max_steps: int | None = None   # hard stop (tests / smoke runs)
    prefetch: int = 2
    batch_sharding: object = None  # e.g. parallel.batch_sharding(mesh)
    val_batches_per_eval: int = 4  # mean/std over k batches, not 1 noisy one
    steps_per_call: int = 1        # fuse k steps into ONE device dispatch
                                   # (lax.scan over stacked batches) — vital on
                                   # high-dispatch-latency runtimes; clamped to
                                   # a divisor of steps_per_epoch so the
                                   # epoch-indexed lr/f_mel schedules stay exact
    bind_args: tuple = ()          # appended to every train_step call as
                                   # explicit jit args (device-resident dataset
                                   # arrays — never closed over, never re-sent)


def run_training(
    ts: dict,
    train_batches: Callable[[], Iterator],
    val_batches: Callable[[], Iterator] | None,
    train_step: Callable,            # (ts, *batch) -> (ts, metrics)
    eval_step: Callable | None,      # (ts, *batch) -> metrics
    loop_cfg: LoopConfig,
    ckpt: Checkpointer | None = None,
    log_dir: str | None = None,
    config_snapshot: dict | None = None,
    on_epoch: Callable[[dict, int], None] | None = None,
    artifact_fn: Callable[[dict, int], None] | None = None,
    pre_eval_fn: Callable[[dict], dict] | None = None,
) -> dict:
    """Run the training loop; returns the final TrainState.

    Auto-resumes: if ``ckpt`` has a saved state, it replaces ``ts`` before
    the first step (the reference required a manual restore() call,
    decoder.py:648).
    """
    resumed_at = None
    if ckpt is not None:
        ts, step = ckpt.restore_into(ts)
        if step is not None:
            print(f" resumed from step {step}")
            resumed_at = int(step)
    # host-side step/epoch mirrors: reading ts["step"] from the device every
    # iteration would force a host<->device sync per step (a full network
    # round-trip on remote runtimes) and serialize the dispatch pipeline
    step = int(ts["step"])
    epoch = int(ts["epoch"])

    trn_writer = MetricsWriter(log_dir, "trn") if log_dir else None
    val_writer = MetricsWriter(log_dir, "val") if log_dir else None
    timer = StepTimer()

    val_iter = None
    if val_batches is not None:
        def fresh_val():
            while True:
                got = False
                for b in val_batches():
                    got = True
                    yield b
                if not got:
                    raise RuntimeError(
                        "validation stream yielded no batches — val split "
                        "smaller than one batch? (lower batch size or raise "
                        "prop_val)")
        val_iter = fresh_val()

    # multi-step dispatch fusion: k steps per compiled call, k | steps_per_epoch
    # (0 = auto: largest divisor of steps_per_epoch <= 16)
    k = loop_cfg.steps_per_call if loop_cfg.steps_per_call else min(
        loop_cfg.steps_per_epoch, 16)
    k = max(1, min(k, loop_cfg.steps_per_epoch))
    while k > 1 and loop_cfg.steps_per_epoch % k:
        k -= 1
    bind = tuple(loop_cfg.bind_args)
    if k > 1:
        import jax

        fused_step = jax.jit(_fuse_steps(train_step, k, n_bind=len(bind)))
        print(f" fusing {k} train steps per device dispatch")
    else:
        fused_step = train_step  # called as fused_step(ts, *batch, *bind)

    # a run resumed at (or past) max_steps OR past n_epochs is already
    # complete: without this guard the k==1 path would execute one extra
    # train step before its max_steps check fires (the k>1 tail check
    # catches it by construction), and an epoch-terminated run restarted
    # would train a whole extra epoch before its boundary check fires
    stop = ((loop_cfg.max_steps is not None and step >= loop_cfg.max_steps)
            or epoch >= loop_cfg.n_epochs)
    pending: list = []
    saved_at: int | None = None  # last step written in-loop (skip dup at end)
    while not stop:
        batches = train_batches()
        seen = {"n": 0}
        if k > 1:
            batches = _stack_iter(batches, k, pending, seen)
        if loop_cfg.prefetch:
            batches = device_prefetch(
                batches, size=loop_cfg.prefetch,
                sharding=_stacked_sharding(loop_cfg.batch_sharding, k))
        got_batch = False
        for batch in batches:
            got_batch = True
            if (k > 1 and loop_cfg.max_steps is not None
                    and step + k > loop_cfg.max_steps):
                # exact-stop tail: run the remaining < k steps unfused
                for i in range(loop_cfg.max_steps - step):
                    ts, metrics = train_step(ts, *(col[i] for col in batch),
                                             *bind)
                step = loop_cfg.max_steps
                timer.tick()
                stop = True
                break
            ts, metrics = fused_step(ts, *batch, *bind)
            timer.tick()
            step += k

            if trn_writer and (step % loop_cfg.log_every_steps < k or step == k):
                # the only per-cadence device fetch: materialize the metrics
                trn_writer.write(step, {**metrics,
                                        "steps_per_sec": timer.steps_per_sec * k,
                                        "epoch": epoch})

            # boundary-crossing check, NOT `step % steps_per_epoch == 0`: a
            # run resumed from a step that isn't on this run's k-grid would
            # never satisfy the modulo and epochs/saves/schedules would stall
            # forever; with this form the boundary fires at the first fused
            # call past it (at most k-1 steps late, exact when aligned)
            if step // loop_cfg.steps_per_epoch > epoch:
                ts = next_epoch(ts)
                epoch += 1
                if on_epoch is not None:
                    on_epoch(ts, epoch)

                if epoch % loop_cfg.save_each_n_epochs == 0:
                    if pre_eval_fn is not None:
                        # e.g. BN recalibration: fix up inference-only state
                        # before it is validated and checkpointed
                        ts = pre_eval_fn(ts)
                    if ckpt is not None:
                        ckpt.save(ts, step=step, config=config_snapshot)
                        saved_at = step
                    if val_iter is not None and eval_step is not None:
                        # k-batch validation: the reference hung best-ckpt
                        # decisions on a single noisy batch (decoder.py:427);
                        # we report mean and spread over k batches.
                        vms = [eval_step(ts, *next(val_iter), *bind)
                               for _ in range(max(loop_cfg.val_batches_per_eval, 1))]
                        vm = {k: float(np.mean([float(m[k]) for m in vms]))
                              for k in vms[0]}
                        if len(vms) > 1:
                            vm.update({f"{k}_std":
                                       float(np.std([float(m[k]) for m in vms]))
                                       for k in vms[0]})
                        if val_writer:
                            val_writer.write(step, vm)
                    if artifact_fn is not None:
                        artifact_fn(ts, step)

                if epoch >= loop_cfg.n_epochs:
                    stop = True
                    break

            if loop_cfg.max_steps is not None and step >= loop_cfg.max_steps:
                stop = True
                break
        else:
            if not got_batch and not (k > 1 and seen["n"]):
                raise RuntimeError(
                    "train_batches yielded no batches — dataset/filter/split "
                    "produced fewer samples than one batch")
            continue
        break

    if saved_at == step or resumed_at == step:
        # final step coincides with an in-loop save (already recalibrated) or
        # the run resumed ALREADY COMPLETE (restart of a finished stage):
        # just make sure the async write landed instead of paying a BN-recal
        # compile + re-writing the identical state over the remote link
        if ckpt is not None:
            ckpt.wait()
    else:
        if pre_eval_fn is not None:
            ts = pre_eval_fn(ts)
        if ckpt is not None:
            ckpt.save(ts, step=step, config=config_snapshot, sync=True)
    for w in (trn_writer, val_writer):
        if w:
            w.close()
    return ts
