"""msgpack-RPC query front-end — the ``image_search_server`` analog.

The reference front-end (``src/image_search_server.cc``) receives a
msgpack-RPC call, picks a random worker host, and *ssh-launches* an mpirun
job per query, parsing stdout. Here the index lives in HBM next to the
server process, so dispatch is a direct library call; and because the
engine is batched, the server micro-batches concurrent requests into one
device launch (request-level parallelism axis of SURVEY.md §2 without
process churn).

Wire protocol: standard msgpack-RPC over TCP —
request ``[0, msgid, method, params]`` / response ``[1, msgid, err, result]``.
Methods:
  * ``ping()                      -> "pong"``        (dispatch parity)
  * ``search_image_by_id(id, k, approx) -> [[id, dist], ...]``
  * ``search_by_code(code_bytes, k, approx) -> [[id, dist], ...]``
  * ``search_batch(codes_bytes, k, approx) -> [[[id, dist], ...], ...]``
  * ``stats() -> {...}``
"""

from __future__ import annotations

import socket
import socketserver
import threading
from typing import Optional

import msgpack
import numpy as np

from verticut_tpu import codes as codes_lib
from verticut_tpu.config import SearchConfig, DEFAULT_SERVER_PORT
from verticut_tpu.utils.logging import get_logger
from verticut_tpu.utils.timer import Timer

log = get_logger("service")


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        unpacker = msgpack.Unpacker(raw=False)
        sock = self.request
        self.server.owner._conns.add(sock)
        try:
            while True:
                data = sock.recv(1 << 16)
                if not data:
                    return
                unpacker.feed(data)
                for msg in unpacker:
                    self._dispatch(sock, msg)
        except OSError:
            return  # connection force-closed by stop()
        finally:
            self.server.owner._conns.discard(sock)

    def _dispatch(self, sock, msg):
        srv: "ImageSearchServer" = self.server.owner
        if not isinstance(msg, (list, tuple)) or len(msg) != 4 or msg[0] != 0:
            return  # ignore notifications/garbage
        _, msgid, method, params = msg
        try:
            with Timer(f"rpc.{method}"):
                result = srv.call(method, params)
            resp = [1, msgid, None, result]
        except Exception as e:  # noqa: BLE001 — errors go on the wire
            log.warning("rpc %s failed: %s", method, e)
            resp = [1, msgid, f"{type(e).__name__}: {e}", None]
        sock.sendall(msgpack.packb(resp, use_bin_type=True))


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class ImageSearchServer:
    """Serves K-NN queries over a built index (single- or multi-device)."""

    def __init__(self, index, host: str = "127.0.0.1",
                 port: int = DEFAULT_SERVER_PORT,
                 default_knn: int = 10, sharded: bool = False):
        self.index = index
        self.sharded = sharded
        self.default_knn = default_knn
        self._srv = _Server((host, port), _Handler)
        self._srv.owner = self
        self.port = self._srv.server_address[1]
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()  # device work serialized
        self.n_requests = 0
        self.n_batches = 0
        # incremented on every (re)start — the Pilaf per-server epoch analog
        # (store-client.cc:146-147): clients detect a bounced server
        self.epoch = 0
        self._conns: set = set()
        # micro-batching state: (knn, approx) -> [(slot, event), ...]
        self._pending: dict = {}
        self._q_lock = threading.Lock()
        # waiters block on this condition; notified at every batch
        # completion and leadership release (no polling latency)
        self._cv = threading.Condition()

    # -- dispatch (the image_search_server.cc:22-48 analog) ------------------

    def call(self, method: str, params):
        if method == "ping":
            return "pong"
        if method == "stats":
            from verticut_tpu.utils.timer import timings
            return {"n_requests": self.n_requests,
                    "n_batches": self.n_batches, "n_codes": self.index.n,
                    "epoch": self.epoch, "timings": timings()}
        if method == "search_image_by_id":
            image_id, knn, approx = (list(params) + [self.default_knn, False]
                                     )[:3]
            codes_arr = self.index.codes
            if codes_arr is None:
                raise ValueError("index holds no code array")
            q = np.asarray(codes_arr[int(image_id):int(image_id) + 1])
            return self._search(q, int(knn), bool(approx))[0]
        if method == "search_by_code":
            code, knn, approx = (list(params) + [self.default_knn, False])[:3]
            q = codes_lib.pack_bytes(np.frombuffer(code, np.uint8)[None])
            return self._search(q, int(knn), bool(approx))[0]
        if method == "search_batch":
            blob, knn, approx = (list(params) + [self.default_knn, False])[:3]
            nbytes = self.index.cfg.n_bytes
            raw = np.frombuffer(blob, np.uint8).reshape(-1, nbytes)
            return self._search(codes_lib.pack_bytes(raw), int(knn),
                                bool(approx))
        raise ValueError(f"unknown method {method!r}")

    def _search(self, queries: np.ndarray, knn: int, approx: bool):
        """Micro-batching: concurrent requests with the same (knn, approx)
        coalesce into one device launch. The reference fans every query out
        as its own mpirun job (``image_search_server.cc:58-83``); a batched
        engine inverts that — request-level parallelism becomes batch rows.
        """
        evt = threading.Event()
        slot = [queries, None]          # [input rows, output rows]
        key = (int(knn), bool(approx))
        with self._q_lock:
            self._pending.setdefault(key, []).append((slot, evt))
        self._run_or_wait(key, evt)
        if isinstance(slot[1], BaseException):
            raise RuntimeError(
                f"batch leader failed: {slot[1]}") from slot[1]
        return slot[1]

    def _run_or_wait(self, key, evt):
        # One thread at a time is the batch leader (device work serialized);
        # everyone else waits on the condition until their event is set.
        # The leader keeps up to TWO device batches in flight (dispatch the
        # next before finalizing the previous) so device work overlaps the
        # host sync — the serving analog of the bench's pipelined
        # throughput mode.
        while not evt.is_set():
            if self._lock.acquire(blocking=False):
                inflight = None
                batch = []
                try:
                    while True:
                        if evt.is_set():
                            # our request is answered: drain the handle we
                            # own and hand leadership back (waiters of the
                            # remaining batches become leaders themselves)
                            if inflight is not None:
                                self._finalize(key, *inflight)
                                inflight = None
                            break
                        with self._q_lock:
                            batch = self._pending.pop(key, [])
                        if not batch:
                            if inflight is None:
                                break  # served by another leader, or done
                            self._finalize(key, *inflight)
                            inflight = None
                            continue
                        dispatched = self._dispatch_device(key, batch)
                        if inflight is not None:
                            self._finalize(key, *inflight)
                        if dispatched is None:  # sync engine (sharded)
                            self._execute_sync(key, batch)
                        else:
                            inflight = (batch,) + dispatched
                            batch = []
                except BaseException as e:
                    # a failing leader must never strand its waiters in the
                    # wait loop: deliver the error to every request whose
                    # event is still pending, then re-raise on the wire
                    for blist in ((inflight[0] if inflight else []), batch):
                        for slot, ev in blist:
                            if not ev.is_set():
                                slot[1] = e
                                ev.set()
                    raise
                finally:
                    self._lock.release()
                    with self._cv:
                        self._cv.notify_all()
            else:
                with self._cv:
                    # re-check under the condition: a completion/release
                    # between our failed acquire and this wait would
                    # otherwise be missed
                    if not evt.is_set() and self._lock.locked():
                        self._cv.wait(timeout=1.0)

    def _pad_batch(self, batch):
        qs = [slot[0] for slot, _ in batch]
        sizes = [q.shape[0] for q in qs]
        queries = np.concatenate(qs)
        nq = queries.shape[0]
        self.n_requests += nq
        self.n_batches += 1
        # pad to a power of two so repeat sizes hit the compile cache
        n_pad = max(8, 1 << (nq - 1).bit_length()) - nq
        if n_pad:
            queries = np.concatenate(
                [queries, np.repeat(queries[:1], n_pad, axis=0)])
        return queries, sizes

    def _dispatch_device(self, key, batch):
        """Launch without waiting; None if only the sync path applies."""
        if self.sharded:
            return None
        from verticut_tpu.search import mih_search_dispatch
        knn, approx = key
        queries, sizes = self._pad_batch(batch)
        h = mih_search_dispatch(self.index, queries,
                                SearchConfig(knn=knn, approximate=approx))
        if h is None:  # fused driver declined: fall back to sync
            return ("sync", queries, sizes)
        return (h, None, sizes)

    def _finalize(self, key, batch, handle, queries_or_none, sizes):
        from verticut_tpu.search import mih_search, mih_search_finalize
        knn, approx = key
        scfg = SearchConfig(knn=knn, approximate=approx)
        if handle == "sync":
            res = mih_search(self.index, queries_or_none, scfg)
        else:
            res = mih_search_finalize(handle)
            if res is None:  # stage-budget edge: redo via the loop driver
                res = mih_search(self.index, handle.queries, scfg)
        self._distribute(batch, sizes, res)

    def _execute_sync(self, key, batch):
        knn, approx = key
        scfg = SearchConfig(knn=knn, approximate=approx)
        queries, sizes = self._pad_batch(batch)
        from verticut_tpu.search.sharded import sharded_mih_search
        res = sharded_mih_search(self.index, queries, scfg)
        self._distribute(batch, sizes, res)

    def _distribute(self, batch, sizes, res):
        lo = 0
        for (slot, evt), sz in zip(batch, sizes):
            rows = []
            for qi in range(lo, lo + sz):
                rows.append([[int(i), int(d)] for i, d in
                             zip(res.ids[qi], res.dists[qi]) if i >= 0])
            slot[1] = rows
            evt.set()
            lo += sz
        with self._cv:
            self._cv.notify_all()

    # -- lifecycle -----------------------------------------------------------

    def start(self):
        self.epoch += 1
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()
        log.info("image-search server on port %d", self.port)
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()
        # proactively disconnect live clients so they reconnect and observe
        # the new epoch (the reference's resize-protocol behavior,
        # store-server.cc:97-146: disconnect all, clients retry)
        for s in list(self._conns):
            try:
                s.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
        if self._thread:
            self._thread.join(timeout=5)
