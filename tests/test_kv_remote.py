"""Network KV layer: the standalone RESP store server (store-server.cc
analog), the Redis-protocol connector against it, and the memcached
text-protocol connector against a protocol-faithful fake."""

import socket
import socketserver
import threading

import numpy as np

from verticut_tpu.kv import KVServer, MemcachedKV, RedisKV, make_store
from verticut_tpu.kv.store import BucketStore


def test_kvserver_redis_roundtrip():
    srv = KVServer(store=make_store("dht")).start()
    try:
        cli = make_store("redis", port=srv.port)
        assert cli.ping()
        assert cli.get(b"missing") is None
        cli.put(b"k1", b"v1")
        cli.put(b"\x00bin\xff", bytes(range(256)))
        assert cli.get(b"k1") == b"v1"
        assert cli.get(b"\x00bin\xff") == bytes(range(256))
        assert cli.contains(b"k1")
        assert cli.remove(b"k1")
        assert not cli.contains(b"k1")
        assert not cli.remove(b"k1")
        # second client sees the first's writes (shared store process)
        cli2 = RedisKV(port=srv.port)
        assert cli2.get(b"\x00bin\xff") == bytes(range(256))
        cli.close()
        cli2.close()
    finally:
        srv.stop()


def test_kvserver_streaming_bucket_build():
    """The reference's streaming build flows through a *network* store:
    BucketStore over the RESP connector over the DHT server."""
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig
    from verticut_tpu.index import build_index

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(80, 16), dtype=np.uint8)
    packed = codes.pack_bytes(raw)
    srv = KVServer(store=make_store("dht")).start()
    try:
        bs = BucketStore(RedisKV(port=srv.port), code_bytes=16)
        subs = np.asarray(codes.all_substrings(np.asarray(packed), 4))
        for img_id in range(80):
            for t in range(4):
                bs.append(t, int(subs[img_id, t]), img_id,
                          raw[img_id].tobytes())
        idx = build_index(packed, MIHConfig(), directory="hash")
        for t in range(4):
            starts, counts = idx.tables[t].directory.lookup(subs[:, t])
            starts, counts = np.asarray(starts), np.asarray(counts)
            eids = np.asarray(idx.tables[t].entry_ids)
            for i in range(80):
                kv_bucket = [p[0] for p in bs.bucket(t, int(subs[i, t]))]
                assert kv_bucket == \
                    eids[starts[i]:starts[i] + counts[i]].tolist()
        bs.store.close()
    finally:
        srv.stop()


class _FakeMemcachedHandler(socketserver.StreamRequestHandler):
    """Text-protocol-faithful in-test memcached."""

    def handle(self):
        d = self.server.data  # type: ignore[attr-defined]
        while True:
            line = self.rfile.readline()
            if not line:
                return
            parts = line.split()
            if parts[0] == b"set":
                n = int(parts[4])
                val = self.rfile.read(n + 2)[:n]
                d[parts[1]] = val
                self.wfile.write(b"STORED\r\n")
            elif parts[0] == b"get":
                v = d.get(parts[1])
                if v is not None:
                    self.wfile.write(b"VALUE %s 0 %d\r\n%s\r\n"
                                     % (parts[1], len(v), v))
                self.wfile.write(b"END\r\n")
            elif parts[0] == b"delete":
                ok = d.pop(parts[1], None) is not None
                self.wfile.write(b"DELETED\r\n" if ok
                                 else b"NOT_FOUND\r\n")
            else:
                self.wfile.write(b"ERROR\r\n")
            self.wfile.flush()


def test_memcached_connector():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0),
                                          _FakeMemcachedHandler)
    srv.data = {}  # type: ignore[attr-defined]
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cli = make_store("memcached", port=srv.server_address[1])
        assert cli.get(b"nope") is None
        cli.put(b"\x01raw", b"hello\r\nworld")
        assert cli.get(b"\x01raw") == b"hello\r\nworld"
        assert cli.contains(b"\x01raw")
        assert cli.remove(b"\x01raw")
        assert cli.get(b"\x01raw") is None
        cli.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_make_store_redis_requires_server():
    """No silent dict fallback: connecting nowhere must raise."""
    import pytest
    with pytest.raises(OSError):
        make_store("redis", port=1, timeout=0.2)
