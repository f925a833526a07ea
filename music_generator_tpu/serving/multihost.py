"""Multi-host serving: one HTTP frontend, every host's chips in the mesh.

The reference has no serving at all (SURVEY.md §2 — this subsystem is a new
first-class component); single-host serving is `serving.server`.  On a
multi-process deployment (a TPU pod: `jax.distributed` initialized, one
process per host) every device call is an SPMD program — ALL processes must
issue the identical `Sampler.generate` call or the cluster deadlocks at the
first collective.  HTTP requests, however, arrive only at one host.

The protocol here is a replay channel, not a second RPC system:

  * process 0 (the LEADER) serves HTTP exactly like the single-host server.
    `lead()` wraps its service's sampler so that every `generate()` call —
    and every time-sliced job's `begin()`/`advance()`/`close()` — first
    ships its arguments (styles, seeds, stream indices, temperatures,
    bars, bucket padding, prime rolls; job ids for slices) to every
    follower over a length-prefixed TCP channel, then runs the real call.
    All sampler calls already serialize under the service's execution
    lock, so the replay order IS the execution order, slice for slice.
  * every other process (a FOLLOWER) builds the identical service (same
    CLI flags → the same warmup call sequence, which is why warmup needs
    no channel: it is deterministic from the flags) and then sits in
    `follow()`, replaying each received call into its own sampler and
    discarding the replicated result.

Determinism does the rest: the sampler's multi-process path
(`Sampler._mp_fns`) shards the stream batch over the global mesh and
returns the notes REPLICATED, so the leader reads complete results locally
and followers have nothing to send back.  Responses stay byte-equal to the
single-host server per deviation #10 (stream-indexed uniforms) —
tests/test_multiprocess.py::test_two_process_serving_matches_single_process
pins it on a real 2-process cluster.

Trust model: the channel carries pickled numpy payloads between cluster
hosts, the same trust domain as jax.distributed's own unauthenticated
coordinator — bind it to the cluster-internal interface, never a public
one.
"""

from __future__ import annotations

import pickle
import socket
import struct
import sys
import threading
import time
import traceback
from typing import Sequence

import numpy as np


class Channel:
    """Length-prefixed pickle frames over a connected socket."""

    def __init__(self, sock: socket.socket):
        self._sock = sock

    def send(self, obj) -> None:
        data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        self._sock.sendall(struct.pack("<Q", len(data)) + data)

    def recv(self):
        (n,) = struct.unpack("<Q", self._recv_exact(8))
        return pickle.loads(self._recv_exact(n))

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("replay channel closed")
            buf.extend(chunk)
        return bytes(buf)

    def close(self) -> None:
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()


class _ReplaySampler:
    """Leader-side sampler wrapper: ship each generate()/begin()/advance()
    to the followers, then run it locally.  Attribute reads fall through
    to the real sampler (the service touches `.cfg` and friends)."""

    def __init__(self, sampler, channels: Sequence[Channel]):
        self._real = sampler
        self._channels = list(channels)
        self._send_lock = threading.Lock()
        self._next_job = 0

    def __getattr__(self, name):
        return getattr(self._real, name)

    def _send(self, payload) -> None:
        with self._send_lock:
            for ch in self._channels:
                ch.send(payload)

    def generate(self, styles, **kwargs):
        # numpy-ify so the frame is self-contained (no jax arrays cross).
        self._send(("generate",
                    [np.asarray(s, np.float32) for s in styles],
                    kwargs))
        return self._real.generate(styles, **kwargs)

    def begin(self, styles, **kwargs):
        """Open an incremental generation on EVERY host (serving's
        time-sliced jobs): followers park the same carry and replay each
        advance — the calls all serialize under the service's execution
        lock, so replay order is execution order, slice for slice."""
        with self._send_lock:
            job_id = self._next_job
            self._next_job += 1
        self._send(("begin", job_id,
                    [np.asarray(s, np.float32) for s in styles],
                    kwargs))
        try:
            real = self._real.begin(styles, **kwargs)
        except Exception:
            # The frame already shipped: send the drop so no follower
            # parks a handle for a job the leader never opened (review
            # r5 — an abandoned job id would leak follower state).  A
            # pre-dispatch validation failure raises identically on
            # every host, so the followers' begin also failed and the
            # drop is a no-op there.
            self._send(("drop", job_id))
            raise
        return _ReplayActive(self, job_id, real)

    def stop_followers(self) -> None:
        with self._send_lock:
            for ch in self._channels:
                try:
                    ch.send(("stop",))
                except (OSError, ConnectionError):
                    pass
                ch.close()


class _ReplayActive:
    """Leader-side ActiveGeneration wrapper: ship each advance()/close()
    to the followers under the job id begin() assigned, then run it
    locally."""

    def __init__(self, proxy: _ReplaySampler, job_id: int, real):
        self._proxy = proxy
        self._job_id = job_id
        self._real = real

    def __getattr__(self, name):
        return getattr(self._real, name)

    def advance(self, num_chunks: int = 1):
        self._proxy._send(("advance", self._job_id, num_chunks))
        return self._real.advance(num_chunks)

    def close(self) -> None:
        self._proxy._send(("drop", self._job_id))
        self._real.close()


def lead(service, host: str, port: int, n_followers: int,
         timeout: float = 300.0) -> _ReplaySampler:
    """Bind the replay channel, wait for every follower to connect, and
    swap the service's sampler for the replaying wrapper.  Returns the
    wrapper (call `.stop_followers()` on shutdown)."""
    srv = socket.create_server((host, port))
    srv.settimeout(timeout)
    channels = []
    try:
        for _ in range(n_followers):
            conn, _addr = srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            channels.append(Channel(conn))
    finally:
        srv.close()
    proxy = _ReplaySampler(service._sampler, channels)
    service._sampler = proxy
    return proxy


def follow(service, host: str, port: int, timeout: float = 300.0) -> int:
    """Connect to the leader and replay its sampler calls until it says
    stop (or the channel drops).  Returns the number of calls replayed."""
    deadline = time.monotonic() + timeout
    sock = None
    while True:
        try:
            sock = socket.create_connection((host, port), timeout=5.0)
            break
        except OSError:
            if time.monotonic() > deadline:
                raise
            time.sleep(0.2)
    sock.settimeout(None)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    ch = Channel(sock)
    replayed = 0
    actives = {}      # job id → this host's parked ActiveGeneration
    failed = {}       # job id → exception this host's begin raised
    try:
        while True:
            try:
                msg = ch.recv()
            except ConnectionError:
                break                      # leader went away: shut down too
            kind = msg[0]
            if kind == "stop":
                break
            if kind == "generate":
                _, styles, kwargs = msg
                try:
                    service._sampler.generate(list(styles), **kwargs)
                except Exception:
                    # Pre-dispatch validation fails identically on the
                    # leader (which answers the HTTP request with the
                    # error); the follower must outlive it.  A DEVICE-
                    # level failure is unrecoverable cluster-wide either
                    # way (a collective half-entered).
                    pass
            elif kind == "begin":          # time-sliced serving jobs
                _, job_id, styles, kwargs = msg
                try:
                    actives[job_id] = service._sampler.begin(list(styles),
                                                             **kwargs)
                except Exception as e:
                    # A pre-dispatch validation failure raised identically
                    # on the leader too (which sends a drop and never
                    # advances this job id) — but a HOST-LOCAL failure
                    # must not be silent: remember the root cause so a
                    # subsequent 'advance' fails with IT, not a masking
                    # KeyError (review r5 finding).
                    failed[job_id] = e
                    traceback.print_exc(file=sys.stderr)
            elif kind == "advance":
                _, job_id, num_chunks = msg
                if job_id in failed:
                    raise RuntimeError(
                        f"leader advanced job {job_id} whose begin failed "
                        f"on this follower (leader/follower state has "
                        f"diverged)") from failed[job_id]
                actives[job_id].advance(num_chunks)
            elif kind == "drop":
                failed.pop(msg[1], None)
                gen = actives.pop(msg[1], None)
                if gen is not None:
                    gen.close()
            else:
                raise ValueError(f"unknown replay verb: {kind!r}")
            replayed += 1
    finally:
        ch.close()
    return replayed
