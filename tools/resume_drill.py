"""Kill-and-resume drill for the production job (VERDICT r04 #5).

Runs ``tools/job.py`` against a corpus, SIGKILLs the whole process
group mid-write, re-runs it with ``--resume`` (the default) and
``--validate``, and reports one JSON line:

    python tools/resume_drill.py --input DIR --output DIR \
        --num-buckets 512 --num-cpus 32 --kill-after 60

The second run must (a) skip every bucket the first run completed,
(b) finish the rest, (c) pass the job's own row-conservation check
(manifest rows == input parquet rows, metadata-only). The printed
summary records buckets completed before the kill, buckets written by
the resume, and both walls — the mid-backfill resume story from the
north rule, exercised at whatever scale the input dir provides.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--kill-after", type=float, default=60.0,
                    help="seconds into run 1 before SIGKILL")
    args = ap.parse_args(argv)

    job_cmd = [
        sys.executable, os.path.join(REPO, "tools", "job.py"),
        "--input", args.input,
        "--output", args.output,
        "--num-buckets", str(args.num_buckets),
        "--num-cpus", str(args.num_cpus),
    ]

    # --- run 1: killed mid-write -------------------------------------
    t0 = time.perf_counter()
    p = subprocess.Popen(
        job_cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group: kill takes Ray down too
    )
    try:
        p.wait(timeout=args.kill_after)
        finished_early = True  # corpus too small for the chosen delay
    except subprocess.TimeoutExpired:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
        finished_early = False
    wall_1 = time.perf_counter() - t0

    from ptrail_ray.state.manifest import completed_buckets

    done_after_kill = len(completed_buckets(args.output))

    # --- run 2: resume + validate ------------------------------------
    t1 = time.perf_counter()
    out = subprocess.run(
        job_cmd + ["--validate"], capture_output=True, text=True, check=True
    )
    wall_2 = time.perf_counter() - t1
    summary = json.loads(out.stdout.strip().splitlines()[-1])

    print(
        json.dumps(
            {
                "killed_mid_write": not finished_early,
                "kill_after_s": args.kill_after,
                "buckets_done_at_kill": done_after_kill,
                "buckets_written_by_resume": summary["buckets_written_this_run"],
                "buckets_total": summary["buckets_total"],
                "rows": summary["rows"],
                "validation": summary.get("validation"),
                "wall_run1_s": round(wall_1, 1),
                "wall_resume_s": round(wall_2, 1),
                "resume_turns_per_sec": round(summary["rows"] / wall_2, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
