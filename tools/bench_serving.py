#!/usr/bin/env python
"""End-to-end HTTP serving benchmark: the deployment surface measured
over a real socket on the chip.

Starts `GenerationService` (the exact object `serve.py` runs) in-process
behind a real `ThreadingHTTPServer`, then measures wall-clock
request→response latency for the serving workloads:

  solo     — POST /generate, 1 piece x 8 bars (interactive request)
  batch16  — POST /generate_batch, 16 mixtures x 8 bars in ONE device
             call (the batched operating point)
  primed   — POST /generate with an 8-bar prime_midi + 8 new bars
             (the r4 primed-continuation surface)
  concurrent16 — 16 simultaneous solo /generate requests with distinct
             (genre, seed): the dynamic-request-coalescing workload.
             Reports wall-clock for ALL 16 plus the device-call count per
             rep (coalescing visible as device_calls << 16; the
             sequential baseline for the same traffic is 16 x solo).
  mixed_bars — 1-bar interactive requests timed WHILE 64-bar co-traffic
             hammers the service: the time-sliced-scheduling workload
             (r5).  Long batches run as parked jobs in slice_bars
             slices, so the short request's p50/p95 sits near the
             quiet-service baseline plus one slice in flight and one
             scheduling round — never a whole 64-bar piece.  The
             unbounded control (grouping disabled) measures the rider
             path: early completion returns it at its own bars after
             the job's first slice.
  overload — a burst past max_pending: counts HTTP 503 sheds vs 200s
             (bounded admission, r5).

Each workload reports every rep chronologically (this box's relay has
transient slow windows — CLAUDE.md; per-rep lists make them visible),
median/min, and derived per-piece + per-timestep costs.  Writes a JSON
artifact; commit it under artifacts/serving_bench_r{N}/.

Run on the TPU box from /root/repo:  python tools/bench_serving.py
(CPU smoke: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/bench_serving.py --reps 2)
"""

import argparse
import base64
import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.read()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--bars", type=int, default=8)
    parser.add_argument("--out", default=os.path.join(
        REPO, "runs", "serving_bench.json"))
    parser.add_argument("--params", default=os.path.join(
        REPO, "artifacts", "trained_model_r3", "params.npz"))
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()
    import jax

    from music_generator_tpu.config import default_config
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.serving.server import (DeepJHTTPServer,
                                                    GenerationService,
                                                    make_handler)
    from tools.check_fidelity import _params_from_npz

    cfg = default_config()
    params = _params_from_npz(DeepJ(cfg), args.params)
    # warmup_buckets=16: every power-of-two bucket a racing coalesced
    # drain can land on pre-compiles at startup (the r5 serving flag —
    # replaces this tool's old manual /generate_batch warm loop).
    service = GenerationService(config=cfg, params=params, warmup=True,
                                warmup_buckets=16)
    httpd = DeepJHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"

    bars = args.bars
    steps = bars * cfg.notes_per_bar
    # An 8-bar prime from the service itself (also pre-compiles the
    # primed path so the measured reps are compile-free, like any
    # deployment past its first request).
    prime_b64 = base64.b64encode(
        _post(url, "/generate", {"genre": 0, "bars": bars, "seed": 123})
    ).decode()

    workloads = {
        "solo": ("/generate",
                 lambda seed: {"genre": 0, "bars": bars, "seed": seed}),
        "batch16": ("/generate_batch",
                    lambda seed: {"styles_list": [[i % 23] for i in range(16)],
                                  "bars": bars, "seed": seed}),
        "primed": ("/generate",
                   lambda seed: {"genre": 0, "bars": bars, "seed": seed,
                                 "prime_midi": prime_b64,
                                 "continuation_only": True}),
    }

    results = {"backend": jax.default_backend(), "bars": bars,
               "reps": args.reps,
               "params": os.path.relpath(args.params, REPO),
               "workloads": {}}
    for name, (path, payload_fn) in workloads.items():
        _post(url, path, payload_fn(0))          # warm this workload's shape
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            _post(url, path, payload_fn(1 + rep))
            times.append(round((time.perf_counter() - t0) * 1e3, 1))
        ordered = sorted(times)
        median = ordered[len(ordered) // 2]
        pieces = 16 if name == "batch16" else 1
        results["workloads"][name] = {
            "path": path,
            "pieces_per_request": pieces,
            "reps_ms": times,                    # chronological
            "median_ms": median,
            "min_ms": ordered[0],
            "median_ms_per_piece": round(median / pieces, 1),
            "median_ms_per_timestep": round(median / (pieces * steps), 3),
        }
        print(name, results["workloads"][name])

    # --- concurrent16: dynamic request coalescing under parallel load ----
    # (Every bucket a racing drain can land on was pre-compiled by
    # warmup_buckets=16 at service construction.)
    def concurrent_rep(nthreads, seed0):
        outs, errs = [None] * nthreads, []
        barrier = threading.Barrier(nthreads + 1)

        def hit(i):
            payload = {"genre": i % 3, "bars": bars, "seed": seed0 + i}
            barrier.wait()
            try:
                outs[i] = _post(url, "/generate", payload)
            except Exception as e:    # noqa: BLE001 — surfaced below
                errs.append(e)

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(nthreads)]
        for t in threads:
            t.start()
        calls0 = service.device_calls
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        dt = (time.perf_counter() - t0) * 1e3
        if errs:
            raise RuntimeError(f"concurrent requests failed: {errs[:3]}")
        return round(dt, 1), service.device_calls - calls0

    nthreads = 16
    concurrent_rep(nthreads, 500)                # warm the protocol path
    times, calls = [], []
    for rep in range(args.reps):
        dt, ncalls = concurrent_rep(nthreads, 1000 + rep * nthreads)
        times.append(dt)
        calls.append(ncalls)
    ordered = sorted(times)
    median = ordered[len(ordered) // 2]
    results["workloads"]["concurrent16"] = {
        "path": "/generate (16 threads)",
        "pieces_per_request": nthreads,
        "reps_ms": times,                        # chronological
        "device_calls_per_rep": calls,           # coalescing factor
        "median_ms": median,
        "min_ms": ordered[0],
        "median_ms_per_piece": round(median / nthreads, 1),
        "median_ms_per_timestep": round(median / (nthreads * steps), 3),
    }
    print("concurrent16", results["workloads"]["concurrent16"])

    # --- mixed_bars: short requests under long co-traffic -----------------
    # Bars-aware coalescing (r5): 1-bar interactive requests must not ride
    # 64-bar batches.  Two background threads keep 64-bar requests in
    # flight while we time `reps` sequential 1-bar requests; the quiet
    # baseline is the same 1-bar request on an idle service.
    long_bars = 64
    _post(url, "/generate", {"genre": 0, "bars": 1, "seed": 9000})
    _post(url, "/generate", {"genre": 0, "bars": long_bars, "seed": 9001})
    quiet = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        _post(url, "/generate", {"genre": 0, "bars": 1, "seed": 9100 + rep})
        quiet.append(round((time.perf_counter() - t0) * 1e3, 1))

    stop = threading.Event()
    errs = []

    def long_traffic(tid):
        s = 0
        while not stop.is_set():
            try:
                _post(url, "/generate",
                      {"genre": tid % 3, "bars": long_bars,
                       "seed": 9500 + tid * 1000 + s})
            except Exception as e:   # noqa: BLE001 — surfaced below
                errs.append(e)
                return
            s += 1

    hammers = [threading.Thread(target=long_traffic, args=(i,))
               for i in range(2)]
    for t in hammers:
        t.start()
    time.sleep(0.2)                 # let the co-traffic reach the device
    busy = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        _post(url, "/generate", {"genre": 0, "bars": 1, "seed": 9200 + rep})
        busy.append(round((time.perf_counter() - t0) * 1e3, 1))
    # Control: disable the grouping (ratio → huge) so the short request
    # RIDES the 64-bar jobs — per-slice early completion returns it at
    # its own bars after the job's next slice, so both policies are
    # bounded; the artifact records both so the scheduler's contract is
    # visible at the surface.
    saved_ratio = service.coalesce_bars_ratio
    service.coalesce_bars_ratio = 1 << 30
    busy_unbounded = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        _post(url, "/generate", {"genre": 0, "bars": 1, "seed": 9300 + rep})
        busy_unbounded.append(round((time.perf_counter() - t0) * 1e3, 1))
    service.coalesce_bars_ratio = saved_ratio
    stop.set()
    for t in hammers:
        t.join()
    if errs:
        raise RuntimeError(f"long co-traffic failed: {errs[:3]}")

    def _pct(xs, q):
        o = sorted(xs)
        return o[min(len(o) - 1, int(round(q * (len(o) - 1))))]

    results["workloads"]["mixed_bars"] = {
        "path": "/generate (1 bar under 64-bar co-traffic)",
        "long_bars": long_bars,
        "quiet_ms": quiet,                   # chronological baseline
        "busy_ms": busy,                     # chronological under load
        "busy_unbounded_ms": busy_unbounded,  # ratio disabled (rides longs)
        "quiet_p50_ms": _pct(quiet, 0.5),
        "busy_p50_ms": _pct(busy, 0.5),
        "busy_p95_ms": _pct(busy, 0.95),
        "busy_unbounded_p50_ms": _pct(busy_unbounded, 0.5),
        "busy_unbounded_p95_ms": _pct(busy_unbounded, 0.95),
        "coalesce_bars_ratio": saved_ratio,
    }
    print("mixed_bars", results["workloads"]["mixed_bars"])

    # --- overload: bounded admission at the HTTP surface ------------------
    # Temporarily shrink the queue and flood it; count 503 sheds.  (The
    # unit suite pins the semantics; this records them at the surface.)
    saved_pending = service.max_pending
    service.max_pending = 2
    codes = []
    code_lock = threading.Lock()

    def flood(i):
        try:
            _post(url, "/generate",
                  {"genre": 0, "bars": bars, "seed": 9900 + i})
            with code_lock:
                codes.append(200)
        except urllib.error.HTTPError as e:
            with code_lock:
                codes.append(e.code)

    floods = [threading.Thread(target=flood, args=(i,)) for i in range(12)]
    for t in floods:
        t.start()
    for t in floods:
        t.join()
    service.max_pending = saved_pending
    results["workloads"]["overload"] = {
        "path": "/generate (12 concurrent, max_pending=2)",
        "status_codes": sorted(codes),
        "shed_503": codes.count(503),
        "served_200": codes.count(200),
    }
    print("overload", results["workloads"]["overload"])

    httpd.shutdown()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
