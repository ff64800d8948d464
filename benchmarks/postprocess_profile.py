"""Host-postprocess attribution + 8-chip ceiling projection (VERDICT r3 #3).

Runs the bench plate workload once (fully warm) and converts the
StageTimer sub-splits that plate_pipeline._finish_chunk now emits
(post_d2h / post_unpack / post_filter / post_stage2 / morse_graphs) into
per-well milliseconds, then projects the multi-chip ceiling: on an
n-chip dp mesh the device share of a well drops ~1/n while the host tail
stays constant per well, so throughput is bound by
max(device/n, host_tail/threads).

Run on the TPU: python benchmarks/postprocess_profile.py [--wells 24]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--wells", type=int, default=24)
    parser.add_argument(
        "--threads", type=int, default=8, help="pool size (plate max_workers)"
    )
    args = parser.parse_args(argv)

    import bench

    stats = bench.run_plate_workload(args.wells, n_reps=1)
    per_well = {
        name: round(total / args.wells * 1000, 2)
        for name, total in stats["stage_totals"].items()
    }
    # TRUE host work only: post_stage2 and device_wait are device-QUEUE
    # time seen from a pool thread (each chunk's programs wait behind the
    # other threads' programs on the single stream) — they shrink with
    # chips like all device work and must not be projected as host tail.
    # post_d2h collapsed from 378 to ~4 ms/well once the copies were
    # enqueued asynchronously behind their producing program (round 4).
    # post_pack is the packbits of the filtered masks — host CPU work that
    # was previously lumped into post_stage2 (advisor r4: the tail slightly
    # understated host work that will NOT shrink with more chips)
    host_tail = sum(
        per_well.get(k, 0.0)
        for k in ("post_d2h", "post_unpack", "post_filter", "post_pack",
                  "morse_graphs")
    )
    # per-well device cost at 1 chip = the pipeline wall (the measured
    # run is device-bound: host work overlaps under it)
    device_ms = per_well.get("device_pipeline", 0.0)

    out = {
        "wells": args.wells,
        "wells_per_sec_measured": round(stats["median"], 2),
        "per_well_ms": per_well,
        "host_tail_ms_per_well": round(host_tail, 2),
    }
    for n in (1, 4, 8):
        dev = device_ms / n
        host = host_tail / args.threads
        bound_ms = max(dev, host)
        out[f"projected_wells_per_sec_{n}chip"] = (
            round(1000.0 / bound_ms, 2) if bound_ms > 0 else None
        )
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
