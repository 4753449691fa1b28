"""The vestigial-tail backends: dataset LMDB recipes and the pure-socket
memcached client (reference basicsr/utils/create_lmdb.py + file_client.py
MemcachedBackend)."""

import os
import socket
import threading

import numpy as np
import pytest


def test_gopro_lmdb_recipe_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("lmdb")
    from turtlevsr_tpu.data.create_lmdb import create_lmdb_for_gopro
    from turtlevsr_tpu.io.file_client import FileClient

    rng = np.random.RandomState(0)
    root = tmp_path / "datasets"
    for sub in ("train/blur_crops", "train/sharp_crops", "test/target",
                "test/input"):
        d = root / "GoPro" / sub
        d.mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(d / f"frame_{i:03d}.png"),
                        (rng.rand(16, 24, 3) * 255).astype(np.uint8))

    create_lmdb_for_gopro(str(root))

    lmdb_path = str(root / "GoPro" / "test" / "input.lmdb")
    assert os.path.exists(os.path.join(lmdb_path, "meta_info.txt"))
    meta = open(os.path.join(lmdb_path, "meta_info.txt")).read()
    assert "frame_000 (16,24,3) 1" in meta  # reference meta format

    client = FileClient("lmdb", db_paths=lmdb_path)
    buf = client.get("frame_001", "default")
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    assert img.shape == (16, 24, 3)


def test_recipe_layouts_match_reference(tmp_path, monkeypatch):
    """Without lmdb installed, pin each recipe's folder layout / suffix /
    lmdb-path choices against the reference's (create_lmdb.py:28-128)."""
    import turtlevsr_tpu.data.create_lmdb as cl

    calls = []
    monkeypatch.setattr(
        cl, "make_lmdb_from_imgs",
        lambda folder, lmdb, imgs, keys: calls.append((folder, lmdb)))
    monkeypatch.setattr(
        cl, "prepare_keys",
        lambda folder, suffix="png": ([f"x.{suffix}"], ["x"]))
    monkeypatch.setattr(cl, "_extract_sidd_mat", lambda *a: None)

    root = str(tmp_path)
    cl.create_lmdb_for_gopro(root)
    assert [c[1] for c in calls] == [
        os.path.join(root, "GoPro", s) + ".lmdb"
        for s in ("train/blur_crops", "train/sharp_crops", "test/target",
                  "test/input")]
    calls.clear()
    cl.create_lmdb_for_reds(root)
    assert len(calls) == 4 and calls[1][1].endswith("val/blur_300.lmdb")
    calls.clear()
    cl.create_lmdb_for_rain13k(root)
    assert len(calls) == 2
    calls.clear()
    cl.create_lmdb_for_sidd(root)
    assert len(calls) == 4 and calls[2][1].endswith("val/input_crops.lmdb")


class _FakeMemcached(threading.Thread):
    """Minimal memcached text-protocol server serving one dict."""

    def __init__(self, store):
        super().__init__(daemon=True)
        self.store = store
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]

    def run(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        while True:
            line = f.readline()
            if not line:
                return
            parts = line.split()
            if parts and parts[0] == b"get":
                key = parts[1].decode()
                if key in self.store:
                    val = self.store[key]
                    conn.sendall(b"VALUE %s 0 %d\r\n%s\r\nEND\r\n"
                                 % (key.encode(), len(val), val))
                else:
                    conn.sendall(b"END\r\n")


def test_memcached_backend():
    from turtlevsr_tpu.io.file_client import FileClient

    srv = _FakeMemcached({"/data/img.png": b"\x89PNG fake bytes"})
    srv.start()
    client = FileClient("memcached",
                        server_list_cfg=f"127.0.0.1:{srv.port}")
    assert client.get("/data/img.png") == b"\x89PNG fake bytes"
    assert client.get("/missing") is None
    with pytest.raises(ValueError):
        client.get("bad key with spaces")


def test_memcached_malformed_reply_drops_socket():
    """A malformed VALUE header (or bad terminator) leaves the stream
    desynchronized — the client must treat it as a connection failure,
    drop the cached socket, and reconnect cleanly on the next get."""
    from turtlevsr_tpu.io.file_client import FileClient

    class _EvilThenGood(threading.Thread):
        def __init__(self):
            super().__init__(daemon=True)
            self.sock = socket.socket()
            self.sock.bind(("127.0.0.1", 0))
            self.sock.listen(2)
            self.port = self.sock.getsockname()[1]

        def run(self):
            # first connection: garbled header (no byte count), then EOF
            conn, _ = self.sock.accept()
            conn.makefile("rb").readline()
            conn.sendall(b"VALUE /k 0\r\n")
            conn.close()
            # second connection: well-formed replies forever
            conn, _ = self.sock.accept()
            f = conn.makefile("rb")
            while f.readline():
                conn.sendall(b"VALUE /k 0 7\r\npayload\r\nEND\r\n")

    srv = _EvilThenGood()
    srv.start()
    client = FileClient("memcached",
                        server_list_cfg=f"127.0.0.1:{srv.port}")
    with pytest.raises(ConnectionError):
        client.get("/k")  # malformed header -> all servers failed
    # the poisoned socket was dropped: this reconnects and succeeds
    assert client.get("/k") == b"payload"


def test_memcached_multi_server_hash_and_failover():
    """Multi-server configs route each key to its crc32-modula primary
    (the libmemcached default) and fail over to the next server only on a
    CONNECTION error — a miss on the primary is an honest miss."""
    import zlib

    from turtlevsr_tpu.io.file_client import FileClient

    srv = _FakeMemcached({"/k": b"payload"})
    srv.start()
    # dead primary for "/k": pick the server order so crc32 routes to a
    # closed port first, forcing the connection-failover path
    dead = socket.socket()
    dead.bind(("127.0.0.1", 0))
    dead_port = dead.getsockname()[1]
    dead.close()  # nothing listens here
    alive = f"127.0.0.1:{srv.port}"
    deadcfg = f"127.0.0.1:{dead_port}"
    servers = ([deadcfg, alive] if zlib.crc32(b"/k") % 2 == 0
               else [alive, deadcfg])
    client = FileClient("memcached", server_list_cfg=servers)
    # primary (dead) -> OSError -> fallback serves it
    assert client.get("/k") == b"payload"
    # the reader is cached per connection: a second get reuses it
    assert client.get("/k") == b"payload"
