"""Multi-node scaling sim on one host: ``ray start`` head + workers with
DISJOINT pinned CPU sets (taskset), so the headline rollup's shuffle runs
across SEPARATE raylets/object stores (real inter-node object transfer
over loopback) instead of one shared in-process plasma store.

Pairs measured (same input, fresh cluster per config):

    1 node x 2 cpus   vs  4 nodes x 2 cpus   ("2->8", the unsaturated
                                              engine-scaling pair)
    1 node x 8 cpus   vs  4 nodes x 8 cpus   ("8->32", sits on this
                                              host's memory-bandwidth
                                              ceiling like the
                                              single-process pair)

Prints ONE JSON line; record it in BASELINE.md next to the
single-process SCALING numbers.

Usage:
    python tools/multinode_scaling.py                 # full run (~6 min)
    python tools/multinode_scaling.py --child ADDR    # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 6379
ADDR = f"127.0.0.1:{PORT}"
HEADLINE_REPS = 2


# --------------------------------------------------------------------------
# child: connect to the running cluster, time the headline + shuffle plan
# --------------------------------------------------------------------------

def child(address: str) -> None:
    import ray

    ray.init(address=address, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, REPO)
    import bench
    from series_correction_project_updated_ray.sources.sequences import (
        read_sequences)
    from series_correction_project_updated_ray.stages.correction import (
        correct_and_rollup, correct_and_rollup_local)

    synth = bench.ensure_synth()
    res = ray.cluster_resources()
    import ray.data as rd

    # warm-up: page cache + per-node worker imports (untimed)
    rd.read_parquet(synth).count()
    correct_and_rollup_local(synth, buckets_per_source=128,
                             step_seconds=1).count()
    n_points = int(rd.read_parquet(synth, columns=["n_tok"]).sum("n_tok"))

    def best_of(fn, reps):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    headline = best_of(
        lambda: correct_and_rollup_local(synth, buckets_per_source=128,
                                         step_seconds=1).count(),
        HEADLINE_REPS)
    shuffle = best_of(
        lambda: correct_and_rollup(read_sequences(synth, num_blocks=64),
                                   buckets_per_source=128,
                                   step_seconds=1).count(),
        HEADLINE_REPS)
    print(json.dumps({
        "cluster_cpus": int(res.get("CPU", 0)),
        "n_nodes": len([n for n in ray.nodes() if n["Alive"]]),
        "headline_sec": headline,
        "shuffle_sec": shuffle,
        "points": n_points,
        "points_per_s": round(n_points / headline, 1),
    }))
    ray.shutdown()


# --------------------------------------------------------------------------
# parent: cluster lifecycle
# --------------------------------------------------------------------------

def _sh(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def stop_cluster() -> None:
    _sh(["ray", "stop", "--force"])
    time.sleep(2)


def start_cluster(cpus_per_node: int, cpusets: list[str],
                  obj_store_bytes: int) -> None:
    """First cpuset hosts the head; the rest join as worker nodes."""
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # ray start must not chase =local
    head = ["taskset", "-c", cpusets[0], "ray", "start", "--head",
            f"--port={PORT}", f"--num-cpus={cpus_per_node}",
            f"--object-store-memory={obj_store_bytes}",
            "--include-dashboard=false", "--disable-usage-stats"]
    r = _sh(head, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"head start failed:\n{r.stderr[-2000:]}")
    for cs in cpusets[1:]:
        r = _sh(["taskset", "-c", cs, "ray", "start",
                 f"--address={ADDR}", f"--num-cpus={cpus_per_node}",
                 f"--object-store-memory={obj_store_bytes}",
                 "--disable-usage-stats"], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"worker start failed:\n{r.stderr[-2000:]}")
    # wait for every node to register
    want = cpus_per_node * len(cpusets)
    probe = ("import ray,sys; ray.init(address='%s', logging_level='ERROR');"
             "ok = ray.cluster_resources().get('CPU',0) >= %d;"
             "ray.shutdown(); sys.exit(0 if ok else 1)" % (ADDR, want))
    env2 = dict(env)
    deadline = time.time() + 60
    while time.time() < deadline:
        if _sh([sys.executable, "-c", probe], env=env2).returncode == 0:
            return
        time.sleep(1)
    raise RuntimeError(f"cluster never reached {want} CPUs")


def run_config(cpus_per_node: int, cpusets: list[str],
               obj_store_bytes: int) -> dict:
    stop_cluster()
    start_cluster(cpus_per_node, cpusets, obj_store_bytes)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", ADDR],
            capture_output=True, text=True, env=env, timeout=1200)
        if r.returncode != 0:
            raise RuntimeError(f"child failed:\n{r.stderr[-3000:]}")
        return json.loads(r.stdout.strip().splitlines()[-1])
    finally:
        stop_cluster()


def main() -> None:
    gb = 1 << 30
    configs = {
        "1node_2cpu": (2, ["0-1"], 2 * gb),
        "4node_2cpu": (2, ["0-1", "2-3", "4-5", "6-7"], 2 * gb),
        "1node_8cpu": (8, ["0-7"], 4 * gb),
        "4node_8cpu": (8, ["0-7", "8-15", "16-23", "24-31"], 4 * gb),
    }
    # --configs a,b  → run only those, print per-config JSON lines
    # (lets a clipped run be resumed config by config)
    if "--configs" in sys.argv:
        names = sys.argv[sys.argv.index("--configs") + 1].split(",")
        for name in names:
            c, cs, ob = configs[name]
            print(json.dumps({name: run_config(c, cs, ob)}))
        return
    results = {}
    for name, (c, cs, ob) in configs.items():
        results[name] = run_config(c, cs, ob)
        print(f"# {name}: {results[name]}", file=sys.stderr)

    def eff(a: str, b: str, key: str) -> float:
        return round(results[a][key] / results[b][key] / 4, 3)

    out = {
        "metric": ("multi-node scaling sim: 1 node vs 4 nodes (disjoint "
                   "taskset cpusets, separate raylets/object stores on one "
                   "host), headline rollup + one-shuffle plan, best of "
                   f"{HEADLINE_REPS}"),
        "configs": results,
        "pairs": {
            "2->8_multinode": {
                "headline_eff": eff("1node_2cpu", "4node_2cpu",
                                    "headline_sec"),
                "shuffle_eff": eff("1node_2cpu", "4node_2cpu",
                                   "shuffle_sec"),
            },
            "8->32_multinode": {
                "headline_eff": eff("1node_8cpu", "4node_8cpu",
                                    "headline_sec"),
                "shuffle_eff": eff("1node_8cpu", "4node_8cpu",
                                   "shuffle_sec"),
            },
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
