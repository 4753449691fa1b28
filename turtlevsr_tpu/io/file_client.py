"""Storage backends facade (basicsr/utils/file_client.py:11-192).

HardDiskBackend is the active path (the reference's lmdb config keys are
vestigial — SURVEY.md §2.5 — but the backend surface is kept for users who
packed datasets into LMDB). The lmdb/memcached backends gate on their
optional imports.
"""

from __future__ import annotations

from typing import Optional


class HardDiskBackend:
    def get(self, filepath: str) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(filepath, "r") as f:
            return f.read()


class LmdbBackend:
    """Multi-env LMDB reader keyed by client name (file_client.py:74-154)."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError("lmdb is not installed; use the disk backend "
                              "or install lmdb") from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {}
        for key, path in zip(client_keys, db_paths):
            self._client[key] = lmdb.open(path, readonly=readonly, lock=lock,
                                          readahead=readahead, **kwargs)

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend:
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise NotImplementedError(
            "memcached backend requires pymemcache/mc, not installed")


class FileClient:
    """Facade dispatching on backend name (file_client.py:156-192)."""

    _backends = {"disk": HardDiskBackend, "lmdb": LmdbBackend,
                 "memcached": MemcachedBackend}

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} is not supported. Currently supported "
                f"ones are {list(self._backends)}")
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key: str = "default"):
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)


def make_lmdb_from_imgs(data_path: str, lmdb_path: str, img_path_list,
                        keys, compress_level: int = 1,
                        map_size: Optional[int] = None) -> None:
    """Pack a frame folder into LMDB + meta_info.txt
    (basicsr/utils/lmdb_util.py:15-143)."""
    import os

    import cv2
    import lmdb

    assert len(img_path_list) == len(keys)
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'")
    if map_size is None:
        img = cv2.imread(os.path.join(data_path, img_path_list[0]),
                         cv2.IMREAD_UNCHANGED)
        _, buf = cv2.imencode(".png", img,
                              [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = buf.nbytes * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    with env.begin(write=True) as txn, \
            open(os.path.join(lmdb_path, "meta_info.txt"), "w") as meta:
        for path, key in zip(img_path_list, keys):
            img = cv2.imread(os.path.join(data_path, path),
                             cv2.IMREAD_UNCHANGED)
            h, w = img.shape[:2]
            c = img.shape[2] if img.ndim == 3 else 1
            _, buf = cv2.imencode(
                ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
            txn.put(key.encode("ascii"), buf.tobytes())
            meta.write(f"{key}.png ({h},{w},{c}) {compress_level}\n")
    env.close()
