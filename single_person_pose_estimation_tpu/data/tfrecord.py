"""TFRecord file I/O — native C++ fast path with a pure-Python fallback.

File framing (identical to TF's): for each record
    uint64  length           (little-endian)
    uint32  masked crc32c of the length bytes
    bytes   data[length]
    uint32  masked crc32c of data
masked(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8  (mod 2^32)

The reference relies on tf.io.TFRecordWriter / TFRecordDataset
(gen_tfrecords.py:108, dataset_builder.py:39); this implementation reads and
writes the same format without TensorFlow. When the C++ extension
(native/tfrecord_io.cpp, built to single_person_pose_estimation_tpu/data/
_tfrecord_io.so) is present it is used for the hot path — record framing +
CRC over mmap'd files; otherwise the Python implementation below is used.

Shard naming follows the reference convention
``file_{split}_%02i-%i.tfrec`` where the trailing integer is the example
count, which the dataset length accounting parses instead of counting
records (dataset_builder.py:304-310).
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Iterator, List, Optional, Sequence

# ---------------------------------------------------------------------------
# crc32c (Castagnoli), table-driven
# ---------------------------------------------------------------------------

_CRC_TABLE: Optional[List[int]] = None


def _crc_table() -> List[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78  # reflected Castagnoli polynomial
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Optional C++ fast path
# ---------------------------------------------------------------------------

_NATIVE_PATH = os.path.join(os.path.dirname(__file__), "_tfrecord_io.so")
_native: Optional[ctypes.CDLL] = None
_build_attempted = False


def _try_build_native() -> None:
    """Best-effort build of the C++ extension (once).

    The sources ship inside the package (../native relative to this file)
    so pip-installed copies can build too; the repo-root native/ shim is
    kept as a fallback for older checkouts."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    here = os.path.dirname(__file__)
    candidates = (os.path.join(here, "..", "native"),
                  os.path.join(here, "..", "..", "native"))
    native_dir = next((d for d in candidates
                       if os.path.exists(os.path.join(d, "tfrecord_io.cpp"))),
                      None)
    if native_dir is None:
        return
    import subprocess
    try:
        subprocess.run(["make", "-C", native_dir], check=False,
                       capture_output=True, timeout=120)
    except Exception:
        pass


def _load_native() -> Optional[ctypes.CDLL]:
    global _native
    if _native is None:
        # Always run the (incremental) make once per process: it is a no-op
        # when the .so is current and REBUILDS one that is older than its
        # source — otherwise a checkout that built before a reader fix
        # would keep loading the stale library forever.
        _try_build_native()
    if _native is None and os.path.exists(_NATIVE_PATH):
        lib = ctypes.CDLL(_NATIVE_PATH)
        lib.tfrec_open.argtypes = [ctypes.c_char_p]
        lib.tfrec_open.restype = ctypes.c_void_p
        lib.tfrec_close.argtypes = [ctypes.c_void_p]
        lib.tfrec_num_records.argtypes = [ctypes.c_void_p]
        lib.tfrec_num_records.restype = ctypes.c_int64
        lib.tfrec_record_ptr.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.POINTER(ctypes.c_int64)]
        lib.tfrec_record_ptr.restype = ctypes.c_void_p
        lib.tfrec_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tfrec_crc32c.restype = ctypes.c_uint32
        _native = lib
    return _native


def native_available() -> bool:
    return _load_native() is not None


# ---------------------------------------------------------------------------
# Reader / Writer
# ---------------------------------------------------------------------------

class TFRecordWriter:
    """Write records in TFRecord framing. Context-manager friendly."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        length = struct.pack("<Q", len(record))
        self._f.write(length)
        self._f.write(struct.pack("<I", masked_crc32c(length)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc32c(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _iter_records_python(path: str, verify_crc: bool) -> Iterator[bytes]:
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if not header:
                return
            if len(header) < 12:
                raise IOError(f"truncated record header in {path}")
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (crc,) = struct.unpack("<I", header[8:12])
                if masked_crc32c(header[:8]) != crc:
                    raise IOError(f"length CRC mismatch in {path}")
            # Bounds-check the untrusted length BEFORE read(): a hostile
            # length near 2^64 (its CRC is computable by anyone) would
            # otherwise overflow read()'s index argument.
            if length > size - f.tell():
                raise IOError(f"truncated record in {path}")
            data = f.read(length)
            footer = f.read(4)
            if len(data) < length or len(footer) < 4:
                raise IOError(f"truncated record in {path}")
            if verify_crc:
                (crc,) = struct.unpack("<I", footer)
                if masked_crc32c(data) != crc:
                    raise IOError(f"data CRC mismatch in {path}")
            yield data


class TFRecordReader:
    """Random-access reader over one TFRecord file.

    With the native library, the file is mmap'd and indexed once in C++
    (CRC-verified there, hardware-accelerated where available); records are
    then zero-copy ctypes slices. Pure-Python fallback scans the framing.
    """

    def __init__(self, path: str, verify_crc: bool = True):
        self.path = path
        self._records: Optional[List[bytes]] = None
        self._handle = None
        lib = _load_native()
        if lib is not None:
            self._lib = lib
            self._handle = lib.tfrec_open(path.encode())
            if not self._handle:
                raise IOError(f"cannot open/index {path}")
        else:
            self._records = list(_iter_records_python(path, verify_crc))

    def __len__(self) -> int:
        if self._handle:
            return int(self._lib.tfrec_num_records(self._handle))
        return len(self._records)

    def __getitem__(self, i: int) -> bytes:
        if self._handle:
            n = ctypes.c_int64()
            ptr = self._lib.tfrec_record_ptr(self._handle, i, ctypes.byref(n))
            if not ptr:
                raise IndexError(i)
            return ctypes.string_at(ptr, n.value)
        return self._records[i]

    def __iter__(self) -> Iterator[bytes]:
        for i in range(len(self)):
            yield self[i]

    def close(self) -> None:
        if self._handle:
            self._lib.tfrec_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def iter_records(path: str, verify_crc: bool = True) -> Iterator[bytes]:
    """Stream records from one file (native-indexed when available)."""
    lib = _load_native()
    if lib is not None:
        reader = TFRecordReader(path)
        try:
            yield from reader
        finally:
            reader.close()
    else:
        yield from _iter_records_python(path, verify_crc)


# ---------------------------------------------------------------------------
# Shard naming (reference convention)
# ---------------------------------------------------------------------------

def shard_filename(split_dir: str, shard_index: int, num_examples: int) -> str:
    """``file_{split}_%02i-%i.tfrec`` (gen_tfrecords.py:108-110)."""
    split = os.path.basename(os.path.normpath(split_dir))
    return os.path.join(split_dir,
                        "file_%s_%.2i-%i.tfrec" % (split, shard_index, num_examples))


def count_examples_from_filenames(filenames: Sequence[str]) -> int:
    """Dataset length from shard-name suffixes (dataset_builder.py:304-310)."""
    total = 0
    for name in filenames:
        stem = os.path.basename(name).rsplit(".", 1)[0]
        total += int(stem.split("-")[-1])
    return total
