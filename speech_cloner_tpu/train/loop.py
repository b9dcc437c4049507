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
    if ckpt is not None:
        ts, step = ckpt.restore_into(ts)
        if step is not None:
            print(f" resumed from step {step}")
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

    stop = False
    while not stop:
        batches = train_batches()
        if loop_cfg.prefetch:
            batches = device_prefetch(batches, size=loop_cfg.prefetch,
                                      sharding=loop_cfg.batch_sharding)
        got_batch = False
        for batch in batches:
            got_batch = True
            ts, metrics = train_step(ts, *batch)
            timer.tick()
            step += 1

            if trn_writer and (step % loop_cfg.log_every_steps == 0 or step == 1):
                # the only per-cadence device fetch: materialize the metrics
                trn_writer.write(step, {**metrics, "steps_per_sec": timer.steps_per_sec,
                                        "epoch": epoch})

            if step % loop_cfg.steps_per_epoch == 0:
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
                    if val_iter is not None and eval_step is not None:
                        # k-batch validation: the reference hung best-ckpt
                        # decisions on a single noisy batch (decoder.py:427);
                        # we report mean and spread over k batches.
                        vms = [eval_step(ts, *next(val_iter))
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
            if not got_batch:
                raise RuntimeError(
                    "train_batches yielded no batches — dataset/filter/split "
                    "produced fewer samples than one batch")
            continue
        break

    if pre_eval_fn is not None:
        ts = pre_eval_fn(ts)
    if ckpt is not None:
        ckpt.save(ts, step=step, config=config_snapshot, sync=True)
    for w in (trn_writer, val_writer):
        if w:
            w.close()
    return ts
