"""Serving tests: the generation service end-to-end over a real HTTP socket
(stdlib server, real request/response), plus request validation."""

import json
import threading
import urllib.request
import urllib.error
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax

from music_generator_tpu import midi
from music_generator_tpu.config import test_config as small_config
from music_generator_tpu.models.deepj import DeepJ, init_params
from music_generator_tpu.serving.server import GenerationService, make_handler

CFG = small_config()


@pytest.fixture(scope="module")
def service():
    model = DeepJ(CFG)
    params = init_params(jax.random.key(0), CFG)
    return GenerationService(config=CFG, params=params, warmup=False)


@pytest.fixture(scope="module")
def server(service):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_stats_reports_scheduler_occupancy(server, service):
    """GET /stats: the operator surface for sizing a deployment — queue
    depth, parked jobs, device-call counter, and the configured bounds."""
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["pending"] == 0 and s["jobs"] == len(service._jobs)
    assert s["active"] == service._active
    assert s["max_pending"] == service.max_pending
    assert s["max_batch"] == service.max_batch
    assert s["slice_bars"] == service.slice_bars
    before = s["device_calls"]
    _post(server, {"genre": 0, "bars": 1, "seed": 3}).read()
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        assert json.loads(r.read())["device_calls"] > before


def test_generate_returns_valid_midi(server):
    with _post(server, {"genre": 0, "bars": 1, "seed": 5}) as r:
        assert r.headers["Content-Type"] == "audio/midi"
        data = r.read()
    import io
    pattern = midi.read_midifile(io.BytesIO(data))
    assert pattern.resolution == CFG.notes_per_beat


def test_generate_deterministic(server):
    a = _post(server, {"styles": [0, 2], "bars": 1, "seed": 9}).read()
    b = _post(server, {"styles": [0, 2], "bars": 1, "seed": 9}).read()
    assert a == b
    c = _post(server, {"styles": [0, 2], "bars": 1, "seed": 10}).read()
    assert a != c


def test_generate_rejects_oversized_body(server):
    """Bodies over the 1 MB cap 413 from the Content-Length header alone —
    before any of the body is read into memory (raw socket: the client
    never has to finish sending for the rejection to arrive)."""
    import socket
    host, port = server.rsplit("//", 1)[1].split(":")
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(b"POST /generate HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Length: 9999999\r\n\r\n")
        resp = s.recv(4096)
    assert b"413" in resp.split(b"\r\n", 1)[0]


def test_generate_rejects_bad_requests(server):
    for payload in [{"styles": [99]}, {"genre": 7},
                    {"mixture": [1.0, 2.0]}]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, payload)
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert "error" in body


def test_mixture_resolution(service):
    m = service.resolve_mixture({"styles": [0, 1]})
    np.testing.assert_allclose(m[:2], 0.5)
    g = service.resolve_mixture({"genre": 0})
    np.testing.assert_allclose(g[:3], 1 / 3)
    v = service.resolve_mixture({"mixture": [0.0] * CFG.num_styles})
    assert v.shape == (CFG.num_styles,)


def test_generate_bars_clamped(service):
    """bars outside [1, 4096] clamp instead of erroring or running away."""
    small = service.generate(bars=0, seed=1)
    assert len(small) > 0
    import io
    pattern = midi.read_midifile(io.BytesIO(small))
    assert len(pattern) >= 1


def test_temperature_sweep_one_executable(service):
    """Varied-temperature traffic must reuse one compiled executable (the
    round-1 advisor finding: a per-temperature sampler cache recompiled per
    novel float and grew without bound) — and bad temperatures 400."""
    from music_generator_tpu.generation.sampler import Sampler

    Sampler._chunk_jit._clear_cache()
    outs = [service.generate(bars=1, seed=3, temperature=t)
            for t in (0.8, 1.0, 1.3, 2.0)]
    assert Sampler._chunk_jit._cache_size() == 1
    assert len(set(outs)) > 1          # temperature actually matters
    with pytest.raises(ValueError):
        service.generate(bars=1, temperature=0.0)
    with pytest.raises(ValueError):
        service.generate(bars=1, temperature=-1.0)


def test_generate_batch_endpoint(server, service):
    """Batched serving: N mixtures → N .mid files from ONE device call; the
    per-index output matches a same-composition direct call (deterministic
    contract documented on GenerationService.generate_batch)."""
    import base64
    payload = {"styles_list": [[0], [1, 2], [3]], "bars": 1, "seed": 6}
    with _post_path(server, "/generate_batch", payload) as r:
        body = json.loads(r.read())
    assert len(body["files"]) == 3
    files = [base64.b64decode(f) for f in body["files"]]
    import io as _io
    for f in files:
        pattern = midi.read_midifile(_io.BytesIO(f))
        assert pattern.resolution == CFG.notes_per_beat
    # Deterministic against the service API with identical composition.
    mixtures = [service.resolve_mixture({"styles": s})
                for s in payload["styles_list"]]
    again = service.generate_batch(mixtures, bars=1, seed=6)
    assert files == again


def test_generate_primed_continuation(server, service):
    """POST /generate with prime_midi: the response is a valid .mid whose
    roll extends the prime (prime echoed + `bars` new bars), and
    continuation_only drops the echo.  The prime round-trips through
    base64 → parser → codec → clamp → teacher-forced sampler state."""
    import base64
    import io as _io
    # Make a prime: generate 1 bar from the service itself.
    prime_bytes = service.generate(mixture=None, bars=1, seed=3)
    prime_b64 = base64.b64encode(prime_bytes).decode()
    with _post(server, {"genre": 0, "bars": 1, "seed": 3,
                        "prime_midi": prime_b64}) as r:
        full = r.read()
    pattern = midi.read_midifile(_io.BytesIO(full))
    assert pattern.resolution == CFG.notes_per_beat

    from music_generator_tpu.data.dataset import clamp_midi
    from music_generator_tpu.midi.codec import midi_decode
    roll_prime = clamp_midi(midi_decode(
        midi.read_midifile(_io.BytesIO(prime_bytes)),
        CFG.midi_max_notes, config=CFG), CFG)
    roll_full = clamp_midi(midi_decode(pattern, CFG.midi_max_notes,
                                       config=CFG), CFG)
    # The echoed prefix survives the round trip bit-for-bit.
    np.testing.assert_array_equal(roll_full[:roll_prime.shape[0]],
                                  roll_prime)

    with _post(server, {"genre": 0, "bars": 1, "seed": 3,
                        "prime_midi": prime_b64,
                        "continuation_only": True}) as r:
        cont = r.read()
    assert cont != full     # the echo is gone
    # continuation_only + prime is deterministic too.
    with _post(server, {"genre": 0, "bars": 1, "seed": 3,
                        "prime_midi": prime_b64,
                        "continuation_only": True}) as r:
        assert r.read() == cont


def test_generate_rejects_invalid_prime(server):
    import base64
    bad = base64.b64encode(b"not a midi file").decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"genre": 0, "bars": 1, "prime_midi": bad})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"genre": 0, "bars": 1, "prime_midi": "!!!"})
    assert e.value.code == 400


def test_generate_batch_rejects_bad(service):
    with pytest.raises(ValueError):
        service.generate_batch([], bars=1)
    with pytest.raises(ValueError):
        service.generate_batch(
            [service.resolve_mixture({"genre": 0})] * 65, bars=1)


def _post_path(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=120)


def test_concurrent_requests_serialize_correctly(server):
    """Hammer /generate from several threads at once: the service's lock
    serializes device work, every request succeeds, and each response is
    byte-identical to its sequential counterpart (no cross-request state
    leaks through the shared sampler)."""
    seeds = [11, 12, 13, 14]
    expected = {s: _post(server, {"genre": 0, "bars": 1, "seed": s}).read()
                for s in seeds}

    results, errors = {}, []

    def hit(seed):
        try:
            results[seed] = _post(
                server, {"genre": 0, "bars": 1, "seed": seed}).read()
        except Exception as e:       # noqa: BLE001 — record, assert below
            errors.append((seed, e))

    threads = [threading.Thread(target=hit, args=(s,)) for s in seeds * 2]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    hung = [t for t in threads if t.is_alive()]
    assert not hung, f"{len(hung)} requests still running after join timeout"
    assert not errors, errors
    for s in seeds:
        assert results[s] == expected[s]


def test_coalesced_batch_single_device_call_matches_solo(service):
    """Dynamic batching's core contract, deterministically: three queued
    requests with different (mixture, bars, seed, temperature) drain in ONE
    device call, and every response is byte-identical to the direct
    (non-coalesced) path for that request alone."""
    from music_generator_tpu.serving.server import _Pending
    mixes = [service.resolve_mixture({"genre": g}) for g in (0, 1, 0)]
    reqs = [_Pending(mixes[0], 2, 5, 1.0),
            _Pending(mixes[1], 1, 9, 0.8),
            _Pending(mixes[2], 2, 5, 1.3)]
    with service._pending_lock:
        service._pending.extend(reqs)
    before = service.device_calls
    with service._lock:
        service._run_pending_locked()
    assert service.device_calls == before + 1
    for r in reqs:
        assert r.done.is_set() and r.error is None
        solo = service.generate_batch([r.mixture], bars=r.bars, seed=r.seed,
                                      temperature=r.temperature)[0]
        assert r.result == solo


def test_coalesced_error_is_per_request(service):
    """A request that fails validation raises in ITS caller before ever
    touching the queue — it can't poison a shared batch."""
    with pytest.raises(ValueError):
        service.generate(bars=1, seed=-1)
    with pytest.raises(ValueError):
        service.generate(bars=1, temperature=200.0)
    with service._pending_lock:
        assert not service._pending


def test_coalesce_bars_ratio_bounds_surplus(service):
    """Bars-aware coalescing: a coalesced batch only mixes requests whose
    bars are within coalesce_bars_ratio (default 4x) of each other, so a
    short request never rides a long co-rider's device call.  Queue
    1-bar, 8-bar, and 2-bar requests: the first (shortest-anchored) drain
    takes {1, 2} and leaves the 8-bar request queued; the second drain
    takes it — two device calls, every response still byte-equal solo."""
    from music_generator_tpu.serving.server import _Pending
    assert service.coalesce_bars_ratio == 4
    mix = service.resolve_mixture({"genre": 0})
    reqs = [_Pending(mix, 1, 21, 1.0),
            _Pending(mix, 8, 22, 1.0),
            _Pending(mix, 2, 23, 1.0)]
    with service._pending_lock:
        service._pending.extend(reqs)
    before = service.device_calls
    with service._lock:
        service._run_pending_locked()
    assert reqs[0].done.is_set() and reqs[2].done.is_set()
    assert not reqs[1].done.is_set()          # the 8-bar one stayed queued
    with service._lock:
        service._run_pending_locked()
    assert reqs[1].done.is_set()
    assert service.device_calls == before + 2
    for r in reqs:
        assert r.error is None
        solo = service.generate_batch([r.mixture], bars=r.bars, seed=r.seed,
                                      temperature=r.temperature)[0]
        assert r.result == solo


def test_shortest_group_drains_first(service):
    """Shortest-group-first selection: a 1-bar request enqueued AFTER two
    64-bar requests still anchors the next drain (it preempts queued —
    not in-flight — long groups), so an interactive request's latency
    under long co-traffic is bounded by one in-flight call plus its own
    short call, not by winning an arrival race (r5 fix; the bench's
    mixed_bars workload measures exactly this)."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 0})
    longs = [_Pending(mix, 64, 31, 1.0), _Pending(mix, 64, 32, 1.0)]
    short = _Pending(mix, 1, 33, 1.0)
    with service._pending_lock:
        service._pending.extend(longs + [short])
    with service._lock:
        service._run_pending_locked()
    assert short.done.is_set() and short.error is None
    assert not longs[0].done.is_set() and not longs[1].done.is_set()
    assert all(r.skips == 1 for r in longs)
    for _ in range(64 // service.slice_bars + 2):   # 8 slices + slack
        if all(r.done.is_set() for r in longs):
            break
        with service._lock:
            service._run_pending_locked()
    for r in longs:
        assert r.done.is_set() and r.error is None


def test_aged_request_anchors_despite_shorter_traffic(service):
    """Anti-starvation aging: a request skipped coalesce_max_skips times
    anchors the next batch even when shorter requests are pending, so a
    1-bar flood delays a 64-bar request by at most max_skips short
    calls."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 1})
    long_req = _Pending(mix, 16, 41, 1.0)
    long_req.skips = service.coalesce_max_skips
    shorts = [_Pending(mix, 1, 42, 1.0), _Pending(mix, 1, 43, 1.0)]
    with service._pending_lock:
        service._pending.extend([long_req] + shorts)
    with service._lock:
        service._run_pending_locked()     # starts the aged 16-bar job
    assert not long_req.done.is_set()     # 16 bars > one 8-bar slice
    assert long_req in [r for j in service._jobs for r in j.batch]
    assert not shorts[0].done.is_set()    # outside 4x of the 16-bar anchor
    for _ in range(6):
        if long_req.done.is_set() and all(r.done.is_set() for r in shorts):
            break
        with service._lock:
            service._run_pending_locked()
    assert long_req.done.is_set() and long_req.error is None
    for r in shorts:
        assert r.done.is_set() and r.error is None


def test_capacity_skip_does_not_age_ratio_reject_does(service):
    """Anti-starvation aging counts only RATIO rejections: a request left
    queued because the batch hit max_batch must NOT age, or under load >
    max_batch the whole queue ages to the anchor override and
    shortest-group-first collapses into FIFO — an interactive request
    would then wait behind every queued long group (review r5 fix)."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 0})
    shorts = [_Pending(mix, 1, i, 1.0)
              for i in range(service.max_batch + 2)]
    long_req = _Pending(mix, 8, 99, 1.0)    # outside 4x of a 1-bar anchor
    with service._pending_lock:
        # The long request sits near the front so selection examines it
        # while the batch still has capacity (a pure ratio rejection).
        service._pending.extend([shorts[0], long_req] + shorts[1:])
    batch = service._select_batch()
    try:
        assert len(batch) == service.max_batch
        assert long_req.skips == 1          # ratio rejection ages
        leftover = [r for r in shorts if r not in batch]
        assert leftover and all(r.skips == 0 for r in leftover)
    finally:
        with service._pending_lock:         # don't leak into other tests
            service._pending = []
            service._active = 0


def test_long_request_ages_at_max_batch_one(service):
    """At max_batch=1 every selection fills instantly, so a long request
    facing steady short traffic is only ever capacity-blocked — it must
    still age via the RATIO term (it IS a bars-class victim) and anchor
    after coalesce_max_skips passes, or it starves forever (review r5:
    aging previously required spare capacity at examination time)."""
    from music_generator_tpu.serving.server import _Pending
    saved = service.max_batch
    service.max_batch = 1
    mix = service.resolve_mixture({"genre": 0})
    long_req = _Pending(mix, 64, 9, 1.0)
    try:
        with service._pending_lock:
            service._pending.append(long_req)
        for k in range(service.coalesce_max_skips):
            with service._pending_lock:
                service._pending.append(_Pending(mix, 1, k, 1.0))
            batch = service._select_batch()
            assert [r.bars for r in batch] == [1]   # short anchors...
            assert long_req.skips == k + 1          # ...but the long ages
        with service._pending_lock:
            service._pending.append(_Pending(mix, 1, 99, 1.0))
        assert service._select_batch() == [long_req]   # aged anchor
    finally:
        service.max_batch = saved
        with service._pending_lock:
            service._pending = []
            service._active = 0


def test_admission_counts_parked_jobs(service):
    """max_pending bounds queued PLUS in-flight requests: a request
    selected into a parked job still counts toward admission until its
    done event is set — otherwise sustained long traffic drains the queue
    into unbounded parked jobs, each holding a device carry, that
    max_pending never sees (review r5)."""
    from music_generator_tpu.serving.server import ServiceOverloaded
    saved = service.max_pending
    service.max_pending = 2
    mix = service.resolve_mixture({"genre": 0})
    try:
        with service._pending_lock:
            service._active = 2          # two requests parked in jobs
        with pytest.raises(ServiceOverloaded):
            service._coalesced(mix, 1, 0, 1.0)
    finally:
        service.max_pending = saved
        with service._pending_lock:
            service._active = 0
            service._pending = []


def test_retire_balances_selection(service):
    """Every request _select_batch admits to the in-flight count is
    retired exactly once — through per-slice early completion, the
    finished path, or the failure path — so _active returns to zero after
    any mix of outcomes (the admission bound would otherwise ratchet
    shut)."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 0})
    reqs = [_Pending(mix, bars, i, 1.0)
            for i, bars in enumerate([1, 8, 16])]
    with service._pending_lock:
        service._pending.extend(reqs)
    with service._lock:
        while any(not r.done.is_set() for r in reqs):
            service._run_pending_locked()
    assert all(r.error is None and r.result[:4] == b"MThd" for r in reqs)
    assert service._active == 0 and not service._jobs


def test_failed_advance_closes_job_handle(service):
    """A device-call failure mid-job must close the incremental handle —
    freeing the parked device carry and (on the multi-host replay
    channel) sending the followers their 'drop' — and fail the members
    (review r5: the old path leaked the handle forever)."""
    from music_generator_tpu.serving.server import _Job, _Pending

    class FakeGen:
        closed = 0

        def advance(self, num_chunks=1):
            raise RuntimeError("device lost")

        def close(self):
            self.closed += 1

    mix = service.resolve_mixture({"genre": 0})
    r = _Pending(mix, 8, 7, 1.0)
    gen = FakeGen()
    job = _Job([r], gen, bars_max=8)
    try:
        service._advance_job(job)
    finally:
        with service._pending_lock:   # job bypassed _select_batch: undo
            service._active = 0       # its retire so _active stays exact
    assert gen.closed == 1
    assert r.done.is_set() and isinstance(r.error, RuntimeError)
    assert job.bars_done >= job.bars_max and not job.parts


def test_finished_job_close_failure_keeps_results(service):
    """The FINISHED-path close is best-effort too: a broken multi-host
    replay channel at close time (close() raising) must not turn a job's
    already-computed results into an exception on the serving thread —
    members keep their MIDI bytes and the job still releases host notes
    (review r5: the finished path was unguarded while the failure path
    was)."""
    from music_generator_tpu.serving.server import _Job, _Pending
    spb = CFG.notes_per_bar

    class FakeGen:
        def advance(self, num_chunks=1):
            return np.zeros(
                (1, service.slice_bars * spb, CFG.num_notes, 3), np.float32)

        def close(self):
            raise ConnectionError("follower channel broken")

    mix = service.resolve_mixture({"genre": 0})
    r = _Pending(mix, service.slice_bars, 3, 1.0)
    job = _Job([r], FakeGen(), bars_max=service.slice_bars)
    try:
        service._advance_job(job)              # must not raise
    finally:
        with service._pending_lock:   # job bypassed _select_batch: undo
            service._active = 0       # its retire so _active stays exact
    assert r.done.is_set() and r.error is None
    assert r.result is not None and r.result[:4] == b"MThd"
    assert not job.parts


def test_follower_begin_failure_surfaces_on_advance():
    """A HOST-LOCAL begin() failure on a follower must not be silently
    swallowed: if the leader (whose begin succeeded) then advances that
    job, the follower fails with the ORIGINAL begin exception chained as
    the cause — not a root-cause-masking KeyError (review r5)."""
    import socket
    from music_generator_tpu.serving import multihost

    class FakeSampler:
        def begin(self, styles, **kw):
            raise ValueError("host-local failure during begin")

    class FakeService:
        _sampler = FakeSampler()

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def leader():
        conn, _addr = srv.accept()
        ch = multihost.Channel(conn)
        ch.send(("begin", 7, [], {}))
        ch.send(("advance", 7, 1))
        try:                       # hold the socket open until the
            ch.recv()              # follower errors out and closes
        except Exception:
            pass

    t = threading.Thread(target=leader, daemon=True)
    t.start()
    try:
        with pytest.raises(RuntimeError, match="leader advanced job 7") as ei:
            multihost.follow(FakeService(), "127.0.0.1", port, timeout=10)
        assert isinstance(ei.value.__cause__, ValueError)
    finally:
        srv.close()
        t.join(timeout=5)


def test_serve_main_initializes_distributed(monkeypatch):
    """serve_main calls maybe_init_distributed() before any backend touch
    (even process_count() initializes XLA) — without it the multi-host
    lead/follow branch is unreachable and every pod host silently serves
    single-process (review r5)."""
    import music_generator_tpu.training.trainer as trainer_mod
    calls = []

    def fake():
        calls.append(True)
        raise SystemExit(0)       # stop before building a real service

    monkeypatch.setattr(trainer_mod, "maybe_init_distributed", fake)
    from music_generator_tpu.serving.server import serve_main
    with pytest.raises(SystemExit):
        serve_main(["--port", "0"])
    assert calls == [True]


def test_time_sliced_job_interleaves_and_matches_solo(service):
    """Continuous batching: a 24-bar job parks between 8-bar slices; a
    1-bar request that arrives mid-job is served on the very next
    alternation pass (it never waits for the job to finish), and the
    interleaved job's bytes still equal its solo run exactly."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 2})
    long_req = _Pending(mix, 24, 51, 1.0)
    with service._pending_lock:
        service._pending.append(long_req)
    with service._lock:
        service._run_pending_locked()     # starts the job, slice 1/3
    assert not long_req.done.is_set() and len(service._jobs) == 1
    short = _Pending(mix, 1, 52, 1.0)
    with service._pending_lock:
        service._pending.append(short)
    with service._lock:
        service._run_pending_locked()     # job's turn: slice 2/3
    with service._lock:
        service._run_pending_locked()     # pending's turn: the short
    assert short.done.is_set() and short.error is None
    assert not long_req.done.is_set()     # still one slice to go
    with service._lock:
        service._run_pending_locked()     # slice 3/3
    assert long_req.done.is_set() and long_req.error is None
    for r in (long_req, short):
        solo = service.generate_batch([r.mixture], bars=r.bars, seed=r.seed,
                                      temperature=r.temperature)[0]
        assert r.result == solo


def test_rider_completes_at_its_own_bars(service):
    """Per-slice early completion: a 4-bar rider coalesced with a 16-bar
    request (within the 4x ratio) finishes after the FIRST slice — it
    doesn't wait for its longest co-rider's piece."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 0})
    rider = _Pending(mix, 4, 61, 1.0)
    long_req = _Pending(mix, 16, 62, 1.0)
    with service._pending_lock:
        service._pending.extend([rider, long_req])
    with service._lock:
        service._run_pending_locked()     # one batch (16 <= 4*4), slice 1
    assert rider.done.is_set() and rider.error is None
    assert not long_req.done.is_set()
    with service._lock:
        service._run_pending_locked()     # slice 2 finishes the long one
    assert long_req.done.is_set() and long_req.error is None
    for r in (rider, long_req):
        solo = service.generate_batch([r.mixture], bars=r.bars, seed=r.seed,
                                      temperature=r.temperature)[0]
        assert r.result == solo


def test_overload_sheds_503(server, service):
    """Past max_pending queued requests, /generate sheds with HTTP 503 +
    Retry-After instead of queueing unboundedly."""
    from music_generator_tpu.serving.server import ServiceOverloaded
    saved = service.max_pending
    service.max_pending = 0       # every admission attempt now sheds
    try:
        with pytest.raises(ServiceOverloaded):
            service.generate(bars=1, seed=77)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, {"genre": 0, "bars": 1, "seed": 77})
        assert e.value.code == 503
        assert e.value.headers["Retry-After"]
        assert "error" in json.loads(e.value.read())
    finally:
        service.max_pending = saved
    # Back under the cap the same request serves fine.
    assert service.generate(bars=1, seed=77)


def test_coalesced_mixture_is_validated(service):
    """A malformed mixture passed via the direct Python API fails its own
    caller before it can reach a shared device call (advisor r4)."""
    with pytest.raises(ValueError):
        service.generate(mixture=np.zeros(3, np.float32), bars=1)
    with service._pending_lock:
        assert not service._pending


def test_coalesced_encode_failure_is_per_request(service, monkeypatch):
    """One request's encode failure must not poison co-batched siblings
    (advisor r4: the old except block set the SAME exception on every
    request, including ones whose result was already computed)."""
    from music_generator_tpu.serving.server import _Pending
    mix = service.resolve_mixture({"genre": 0})
    reqs = [_Pending(mix, 1, 31, 1.0), _Pending(mix, 1, 32, 1.0)]
    real_encode = type(service)._encode_midi
    calls = {"n": 0}

    def flaky_encode(self, roll):
        calls["n"] += 1
        if calls["n"] == 1:       # first request's encode blows up
            raise RuntimeError("boom")
        return real_encode(self, roll)

    monkeypatch.setattr(type(service), "_encode_midi", flaky_encode)
    with service._pending_lock:
        service._pending.extend(reqs)
    with service._lock:
        service._run_pending_locked()
    assert isinstance(reqs[0].error, RuntimeError)
    assert reqs[1].error is None and reqs[1].result is not None
    monkeypatch.undo()
    solo = service.generate_batch([mix], bars=1, seed=32)[0]
    assert reqs[1].result == solo


def test_warmup_buckets_precompiles_every_bucket(service):
    """warmup(N) compiles one executable per power-of-two bucket up to N
    (capped at max_batch, which joins as the top bucket when not itself a
    power of two) — so no later request pays a batch-shape compile with
    the execution lock held."""
    from music_generator_tpu.generation.sampler import Sampler
    Sampler._chunk_jit._clear_cache()
    assert service.warmup(4) == [1, 2, 4]
    # On a multi-device host the sampler additionally pads each bucket to
    # mesh divisibility, so buckets below the device count share one
    # executable (8 on the tests' virtual mesh; distinct shapes on one chip).
    mesh = service._sampler.mesh
    mesh_pad = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    expected = len({max(b, mesh_pad) for b in (1, 2, 4)})
    assert Sampler._chunk_jit._cache_size() == expected
    # Already-warmed buckets recompile nothing.
    service.warmup(4)
    assert Sampler._chunk_jit._cache_size() == expected


def test_concurrent_heterogeneous_requests_match_sequential(server):
    """Concurrent /generate traffic with DIFFERENT bars/seeds/temperatures:
    whether or not the leader coalesces any given pair, every response must
    equal its sequential re-request (dynamic batching is byte-invisible)."""
    payloads = [{"genre": g % 3, "bars": 1 + (g % 2), "seed": 40 + g,
                 "temperature": 1.0 + 0.1 * g} for g in range(4)]
    results, errors = [None] * 4, []

    def hit(i):
        try:
            results[i] = _post(server, payloads[i]).read()
        except Exception as e:       # noqa: BLE001 — record, assert below
            errors.append((i, e))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not [t for t in threads if t.is_alive()], "requests hung"
    assert not errors, errors
    for i, p in enumerate(payloads):
        assert results[i] == _post(server, p).read()


def test_out_of_range_seed_is_http_400(server):
    """seed=-1 used to escape do_POST's caught-exception tuple as an
    OverflowError and reset the connection; the sampler now raises
    ValueError, which the handler maps to a clean 400 (review r4)."""
    for bad_seed in (-1, 2 ** 32):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, {"genre": 0, "bars": 1, "seed": bad_seed})
        assert e.value.code == 400
        assert "seed" in json.loads(e.value.read())["error"]


def test_chunked_transfer_encoding_rejected(server):
    """A chunked body must not silently read as empty (a 200 with DEFAULT
    parameters — wrong output for the client's request — plus unread chunk
    frames corrupting the keep-alive stream): the server answers 411 and
    closes the connection (review r4)."""
    import socket
    host, port = server.rsplit("//", 1)[1].split(":")
    body = json.dumps({"genre": 1, "bars": 1}).encode()
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(b"POST /generate HTTP/1.1\r\nHost: t\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\n"
                  + hex(len(body))[2:].encode() + b"\r\n" + body
                  + b"\r\n0\r\n\r\n")
        resp = s.recv(4096)
    assert b"411" in resp.split(b"\r\n", 1)[0]
