"""Measure the long-cycle multigrid phases' train step rates on this device.

    python -m x3d_tpu.tools.bench_multigrid [--variant=M] [--steps=10]

For each phase of the variant's MULTIGRID.LONG_CYCLE_FACTORS (default
8/4/2/1 batch multipliers), times the full train step at the phase's
(batch, T, S) geometry via the ``tools/ab`` methodology (min over 3 timed
rounds of chained steps), then reports the projected epoch-time speedup of
a multigrid data pass vs the base shape:

    speedup = (base_steps / base_rate_steps_per_s)
            / sum_over_cycle(phase_steps / phase_rate) * len(cycle)

i.e. the ratio of base epoch time to the mean epoch time across one full
long cycle (each epoch sees ~one dataset pass at any phase — the schedule
keeps ``batch * steps_per_epoch`` constant, train/multigrid.py).

Prints one JSON line.  The paper's headline (3-4x to a given accuracy)
also banks on fewer effective epochs; this tool measures only the pure
throughput term on this device, which is the part that is hardware-
dependent.
"""

from __future__ import annotations

import json


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("variant", "M", "X3D variant.")
    flags.DEFINE_integer("steps", 10, "Chained steps per timed round.")
    flags.DEFINE_integer("base_steps_per_epoch", 100,
                         "Base steps/epoch used to weight the phases.")
    FLAGS = flags.FLAGS

    def run(_):
        from x3d_tpu import variant_config
        from x3d_tpu.tools.ab import run_ab
        from x3d_tpu.train.multigrid import MultigridSchedule

        cfg = variant_config(FLAGS.variant.upper())
        sched = MultigridSchedule(cfg, FLAGS.base_steps_per_epoch,
                                  epochs=len(cfg.MULTIGRID.LONG_CYCLE_FACTORS))
        phases = []
        cycle_time = 0.0
        for p in sched.phases:
            r = run_ab(FLAGS.variant.upper(), dw="aligned", pw="conv",
                       batch=p.batch_size, steps=FLAGS.steps,
                       crop=p.crop_size, temp=p.temp_duration)
            epoch_s = p.steps_per_epoch * r["step_ms"] / 1e3
            cycle_time += epoch_s
            phases.append({
                "phase": p.index, "batch": p.batch_size,
                "input": f"{p.temp_duration}x{p.crop_size}^2",
                "steps_per_epoch": p.steps_per_epoch,
                "step_ms": r["step_ms"],
                "clips_per_s": r["clips_per_s"],
                "epoch_s": round(epoch_s, 2),
            })
        base_epoch_s = phases[-1]["epoch_s"]
        mean_epoch_s = cycle_time / len(phases)
        print(json.dumps({
            "variant": FLAGS.variant.upper(),
            "base_steps_per_epoch": FLAGS.base_steps_per_epoch,
            "phases": phases,
            "base_epoch_s": round(base_epoch_s, 2),
            "multigrid_mean_epoch_s": round(mean_epoch_s, 2),
            "epoch_time_speedup": round(base_epoch_s / mean_epoch_s, 3),
        }))

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
