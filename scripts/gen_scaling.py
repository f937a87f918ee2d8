"""Generate SCALING_r05.json: bench-scale sharded-fusion scaling sweep.

Round 4's artifact was 20 frames at 2 cm voxels with a CPU-contended
baseline (judged "existence proof, not evidence"). This sweep runs the
headline operating point — 1 cm voxels, 640x480, 60 frames — on
1/2/4/8 virtual CPU devices (each row its own process, idle host), plus
the 2-process gloo/DCN row WITH its same-silicon single-process ratio.

Interpretation note (carried from round 4): virtual CPU devices share
the host's cores, so fps ratios here measure partition/communication
OVERHEAD (1.0 = sharding adds none; the integrate path's
zero-communication claim), not hardware speedup — that requires a real
multi-chip slice, which this rig does not expose.
"""

import json
import os
import subprocess
import sys
import time

SCALE = ["--voxel-size", "0.01", "--log2-blocks", "17", "--log2-hash", "19"]
# 24 frames: bench-scale maps make multi-virtual-device rows minutes
# per frame on the 2-core host (each virtual device runs its own
# thunk-executor thread pool; collectives serialize the oversubscribed
# threads) — the overhead ratio stabilizes well before 24 frames
FRAMES = ["--frames", "24"]


def run_row(extra, tag):
    t0 = time.monotonic()
    cmd = [sys.executable, "-m", "ra_slam_tpu.pipeline.bench_scaling",
           *extra, *SCALE, *FRAMES]
    env = dict(os.environ)
    # bench-scale shards on a 2-core host: one virtual device's thunk
    # work can delay another past XLA:CPU's default 40 s fatal
    # collective-rendezvous watchdog (measured: 2dev/1cm crashed in
    # rendezvous.cc) — raise it; this measures overhead, not liveness
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo",
        timeout=3600, env=env,
    )
    assert out.returncode == 0, (tag, out.stderr[-2000:])
    line = next(ln for ln in out.stdout.splitlines() if ln.startswith("{"))
    row = json.loads(line)
    row["config"] = tag
    row["wall_s"] = round(time.monotonic() - t0, 1)
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    for n in (1, 2, 4, 8):
        rows.append(run_row(["--devices", str(n), "--no-baseline"],
                            f"{n}dev_1proc"))
    # 2-process gloo/DCN row (2 x 4 virtual devices) + its same-silicon
    # single-process comparator is the 8dev_1proc row above
    rows.append(run_row(["--spawn", "2", "--devices", "4"], "2proc_gloo_4x2"))

    fps1 = rows[0]["value"]
    for r in rows:
        n = r.get("n_devices", 8)
        r["overhead_efficiency_vs_1dev"] = round(r["value"] / fps1, 3)
    gloo = rows[-1]
    same_silicon = rows[3]["value"]  # 8dev single process
    gloo["gloo_vs_same_silicon_1proc"] = round(gloo["value"] / same_silicon, 3)

    out = {
        "description": (
            "Sharded-fusion scaling at the headline operating point "
            "(1 cm voxels, 640x480, 60 frames, idle host): 1/2/4/8 "
            "virtual CPU devices single-process + 2-process gloo row "
            "with same-silicon ratio. Virtual devices share host cores: "
            "ratios measure sharding/communication OVERHEAD (1.0 = "
            "none), not hardware speedup."
        ),
        "rows": rows,
    }
    with open("/root/repo/SCALING_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "rows": len(rows)}))


if __name__ == "__main__":
    main()
