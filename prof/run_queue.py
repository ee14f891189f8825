"""Serial knob A/B queue over the bench children (tunnel-safe).

Runs bench.py's isolated children (RAYFINDER_BENCH_CHILD=1 -> Duck,
=courtyard -> courtyard) under a list of env overrides, one at a time,
appending one JSON line per run to the log. Each child is its own
process, so a worker fault costs one reading, not the queue. Usage:

    python prof/run_queue.py QUEUE.json [LOG]

QUEUE.json: [{"label": ..., "child": "duck"|"court", "env": {...},
             "reps": 1, "timeout": 1800}, ...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def run_child(child: str, env_over: dict, timeout: float) -> dict:
    env = dict(os.environ)
    env["RAYFINDER_BENCH_CHILD"] = "1" if child == "duck" else "courtyard"
    env.update({k: str(v) for k, v in env_over.items()})
    t0 = time.time()
    out = {"child": child, "env": env_over}
    try:
        r = subprocess.run(
            [sys.executable, "-u", BENCH],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        out["rc"] = r.returncode
        stdout = r.stdout or ""
        for line in stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    out.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
        tail = ((r.stderr or "").strip().splitlines() or [""])[-1]
        out["stderr_tail"] = tail[-300:]
    except subprocess.TimeoutExpired:
        out["rc"] = "timeout"
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    queue = json.load(open(sys.argv[1]))
    log = sys.argv[2] if len(sys.argv) > 2 else "/tmp/queue_results.jsonl"
    for item in queue:
        for rep in range(int(item.get("reps", 1))):
            res = run_child(
                item.get("child", "duck"),
                item.get("env", {}),
                float(item.get("timeout", 1800)),
            )
            res["label"] = item["label"]
            res["rep"] = rep
            with open(log, "a") as f:
                f.write(json.dumps(res) + "\n")
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
