"""ctypes bindings for the native host library (native/liblora_host.so).

Builds the library on first use if a C++ toolchain is present; all callers
must handle ``available() == False`` (pure-Python fallbacks live in
gr_lora_tpu.core).  The native codec is the packet-rate fast path for
gateway-scale deployments; the SPSC ring buffer backs streaming ingest.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..config import LoraConfig

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "liblora_host.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


class LoraParams(ctypes.Structure):
    _fields_ = [
        ("sf", ctypes.c_int32), ("cr", ctypes.c_int32),
        ("crc", ctypes.c_int32), ("ldr", ctypes.c_int32),
        ("explicit_header", ctypes.c_int32), ("payload_len", ctypes.c_int32),
    ]

    @classmethod
    def from_config(cls, cfg: LoraConfig) -> "LoraParams":
        return cls(cfg.sf, cfg.cr, int(cfg.crc), int(cfg.ldr),
                   int(cfg.explicit_header), cfg.payload_len)


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=300)
        return _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def _stale() -> bool:
    """True when the .so is missing or older than any native source —
    a stale library would silently ignore newly added C-API parameters."""
    if not _LIB_PATH.exists():
        return True
    t = _LIB_PATH.stat().st_mtime
    paths = (list((_NATIVE_DIR / "src").glob("*"))
             + list((_NATIVE_DIR / "include").glob("*"))
             + [_NATIVE_DIR / "Makefile"])
    return any(p.is_file() and p.stat().st_mtime > t for p in paths)


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _stale():
            # NEVER load a known-stale binary: the ctypes signatures
            # below describe the CURRENT C API, and an old .so would
            # silently ignore newly added parameters (e.g.
            # quantize_round).  No library beats a wrong one — callers
            # degrade to the Python twins.
            if os.environ.get("GR_LORA_TPU_NO_NATIVE_BUILD") == "1":
                return None
            if not _build():
                return None
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        pp = ctypes.POINTER(LoraParams)
        lib.lora_calc_sym_num.restype = ctypes.c_int32
        lib.lora_calc_sym_num.argtypes = [pp, ctypes.c_int32]
        lib.lora_encode.restype = ctypes.c_int32
        lib.lora_encode.argtypes = [pp, u8p, ctypes.c_int32, u16p,
                                    ctypes.c_int32]
        lib.lora_decode.restype = ctypes.c_int32
        lib.lora_decode.argtypes = [pp, u16p, ctypes.c_int32, u8p,
                                    ctypes.c_int32, i32p, i32p, i32p, i32p,
                                    i32p]
        lib.lora_data_checksum.restype = ctypes.c_uint16
        lib.lora_data_checksum.argtypes = [u8p, ctypes.c_int32]
        lib.lora_header_checksum.restype = ctypes.c_uint8
        lib.lora_header_checksum.argtypes = [ctypes.c_uint8, ctypes.c_uint8]
        lib.lora_whitening_sequence.restype = None
        lib.lora_whitening_sequence.argtypes = [u8p]
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.lora_pyramid_create.restype = ctypes.c_void_p
        lib.lora_pyramid_create.argtypes = ([ctypes.c_int32] * 4
                                            + [ctypes.c_float]
                                            + [ctypes.c_int32] * 3)
        lib.lora_pyramid_destroy.argtypes = [ctypes.c_void_p]
        lib.lora_pyramid_step.argtypes = [ctypes.c_void_p, i32p, f32p, f32p,
                                          ctypes.c_int32]
        lib.lora_pyramid_pending.restype = ctypes.c_int32
        lib.lora_pyramid_pending.argtypes = [ctypes.c_void_p]
        lib.lora_pyramid_pop.restype = ctypes.c_int32
        lib.lora_pyramid_pop.argtypes = [ctypes.c_void_p, u16p, ctypes.c_int32]
        _i64p = ctypes.POINTER(ctypes.c_int64)
        lib.lora_pyramid_pop_ts.restype = ctypes.c_int32
        lib.lora_pyramid_pop_ts.argtypes = [ctypes.c_void_p, u16p,
                                            ctypes.c_int32, _i64p]
        lib.lora_pyramid_flush_hops.restype = ctypes.c_int32
        lib.lora_pyramid_flush_hops.argtypes = [ctypes.c_void_p]
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.lora_pyramid_stats.argtypes = [ctypes.c_void_p, i64p]
        u8pp = ctypes.POINTER(ctypes.c_uint8)
        lib.lora_pyramid_multi_create.restype = ctypes.c_void_p
        lib.lora_pyramid_multi_create.argtypes = (
            [ctypes.c_int32] * 5 + [ctypes.c_float]
            + [ctypes.c_int32] * 3)
        lib.lora_pyramid_multi_destroy.argtypes = [ctypes.c_void_p]
        lib.lora_pyramid_multi_feed.argtypes = [
            ctypes.c_void_p, i32p, f32p, f32p, u8pp,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.lora_pyramid_multi_pending.restype = ctypes.c_int32
        lib.lora_pyramid_multi_pending.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_int32]
        lib.lora_pyramid_multi_pop.restype = ctypes.c_int32
        lib.lora_pyramid_multi_pop.argtypes = [ctypes.c_void_p,
                                               ctypes.c_int32, u16p,
                                               ctypes.c_int32]
        lib.lora_pyramid_multi_pop_ts.restype = ctypes.c_int32
        lib.lora_pyramid_multi_pop_ts.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_int32, u16p,
                                                  ctypes.c_int32, i64p]
        lib.lora_pyramid_multi_flush_hops.restype = ctypes.c_int32
        lib.lora_pyramid_multi_flush_hops.argtypes = [ctypes.c_void_p]
        lib.lora_pyramid_multi_stats.argtypes = [ctypes.c_void_p, i64p]
        lib.lora_ring_create.restype = ctypes.c_void_p
        lib.lora_ring_create.argtypes = [ctypes.c_size_t]
        lib.lora_ring_destroy.argtypes = [ctypes.c_void_p]
        for f in ("lora_ring_capacity", "lora_ring_readable",
                  "lora_ring_writable"):
            getattr(lib, f).restype = ctypes.c_size_t
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        for f in ("lora_ring_write", "lora_ring_read", "lora_ring_peek"):
            getattr(lib, f).restype = ctypes.c_size_t
            getattr(lib, f).argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def encode(payload: bytes, cfg: LoraConfig) -> np.ndarray:
    """Native payload -> symbols; bit-exact with core.codec.encode."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    prm = LoraParams.from_config(cfg)
    data = np.frombuffer(bytes(payload), dtype=np.uint8)
    cap = lib.lora_calc_sym_num(ctypes.byref(prm), len(data)) + 16
    out = np.zeros(cap, dtype=np.uint16)
    n = lib.lora_encode(
        ctypes.byref(prm),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap)
    assert n >= 0, f"lora_encode failed: {n}"
    return out[:n].copy()


def decode(symbols: np.ndarray, cfg: LoraConfig):
    """Native symbols -> (bytes, hdr dict | None, crc_ok | None, ok)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    prm = LoraParams.from_config(cfg)
    syms = np.ascontiguousarray(symbols, dtype=np.uint16)
    cap = 1024
    out = np.zeros(cap, dtype=np.uint8)
    hv, hl, hc, hk, ck = (ctypes.c_int32(-1) for _ in range(5))
    n = lib.lora_decode(
        ctypes.byref(prm),
        syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(syms),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(hv), ctypes.byref(hl), ctypes.byref(hc),
        ctypes.byref(hk), ctypes.byref(ck))
    header = None
    if cfg.explicit_header:
        header = dict(is_valid=bool(hv.value), payload_len=hl.value,
                      cr=hc.value, crc=bool(hk.value))
    if n < 0:
        return np.zeros(0, np.uint8), header, None, False
    crc_ok = None if ck.value < 0 else bool(ck.value)
    return out[:n].copy(), header, crc_ok, True


def data_checksum(data: bytes) -> int:
    lib = _load()
    assert lib is not None
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    return int(lib.lora_data_checksum(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr)))


def whitening_sequence() -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.zeros(255, dtype=np.uint8)
    lib.lora_whitening_sequence(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


class RingBuffer:
    """SPSC byte ring buffer (GR stream-buffer analog), native-backed."""

    def __init__(self, capacity: int):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._h = lib.lora_ring_create(capacity)
        if not self._h:
            raise MemoryError("lora_ring_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.lora_ring_destroy(h)
            self._h = None

    @property
    def capacity(self) -> int:
        return self._lib.lora_ring_capacity(self._h)

    @property
    def readable(self) -> int:
        return self._lib.lora_ring_readable(self._h)

    @property
    def writable(self) -> int:
        return self._lib.lora_ring_writable(self._h)

    def _u8(self, arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def write(self, data) -> int:
        arr = np.ascontiguousarray(np.frombuffer(bytes(data), np.uint8)) \
            if isinstance(data, (bytes, bytearray)) \
            else np.ascontiguousarray(data, np.uint8).reshape(-1)
        return self._lib.lora_ring_write(self._h, self._u8(arr), arr.nbytes)

    def read(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.uint8)
        got = self._lib.lora_ring_read(self._h, self._u8(out), n)
        return out[:got]

    def peek(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.uint8)
        got = self._lib.lora_ring_peek(self._h, self._u8(out), n)
        return out[:got]


class PyramidTracker:
    """Native pyramid peak-track state machine; drop-in for
    models.pyramid.PyramidTracker's step/flush surface."""

    def __init__(self, cfg: LoraConfig, grace: int = 0,
                 split_repeats: bool = False, quantize: str = "round"):
        lib = _load()
        assert lib is not None, "native library unavailable"
        assert quantize in ("floor", "round"), quantize
        self._lib = lib
        self._h = lib.lora_pyramid_create(cfg.sf, cfg.p, cfg.fft_factor,
                                          int(cfg.ldr), cfg.threshold, grace,
                                          int(split_repeats),
                                          int(quantize == "round"))
        if not self._h:
            raise MemoryError("lora_pyramid_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.lora_pyramid_destroy(h)
            self._h = None

    def step(self, bins=(), h=(), h_single=()):
        import ctypes as _ct
        b = np.ascontiguousarray(bins, np.int32)
        hh = np.ascontiguousarray(h, np.float32)
        hs = np.ascontiguousarray(h_single, np.float32)
        self._lib.lora_pyramid_step(
            self._h,
            b.ctypes.data_as(_ct.POINTER(_ct.c_int32)),
            hh.ctypes.data_as(_ct.POINTER(_ct.c_float)),
            hs.ctypes.data_as(_ct.POINTER(_ct.c_float)),
            len(b))

    def flush_hops(self) -> int:
        return int(self._lib.lora_pyramid_flush_hops(self._h))

    def drain(self) -> list[np.ndarray]:
        import ctypes as _ct
        out = []
        buf = np.zeros(4096, np.uint16)
        while self._lib.lora_pyramid_pending(self._h) > 0:
            n = self._lib.lora_pyramid_pop(
                self._h, buf.ctypes.data_as(_ct.POINTER(_ct.c_uint16)),
                len(buf))
            if n == -2:          # packet larger than buffer: grow and retry
                buf = np.zeros(len(buf) * 2, np.uint16)
                continue
            if n < 0:
                break
            out.append(buf[:n].copy())
        return out

    def drain_ts(self) -> list[tuple[int, np.ndarray]]:
        """As drain(), but yields (preamble timestamp, symbols) pairs
        (lora_pyramid_pop_ts; ts is mod 2^28 like the tracker clock)."""
        import ctypes as _ct
        out = []
        buf = np.zeros(4096, np.uint16)
        ts = _ct.c_int64(0)
        while self._lib.lora_pyramid_pending(self._h) > 0:
            n = self._lib.lora_pyramid_pop_ts(
                self._h, buf.ctypes.data_as(_ct.POINTER(_ct.c_uint16)),
                len(buf), _ct.byref(ts))
            if n == -2:          # packet larger than buffer: grow and retry
                buf = np.zeros(len(buf) * 2, np.uint16)
                continue
            if n < 0:
                break
            out.append((int(ts.value), buf[:n].copy()))
        return out

    def stats(self) -> dict:
        import ctypes as _ct
        s = np.zeros(3, np.int64)
        self._lib.lora_pyramid_stats(
            self._h, s.ctypes.data_as(_ct.POINTER(_ct.c_int64)))
        return {"tracks_dropped": int(s[0]), "packets_dropped": int(s[1]),
                "tracks_overflow_finalized": int(s[2])}


class MultiPyramidTracker:
    """Bank of per-channel pyramid trackers advanced by whole [C, H, M]
    peak-lattice blocks in one native call — the packet-rate host half of
    the gateway-scale collision decoder (dist/pyramid_gateway.py)."""

    def __init__(self, cfg: LoraConfig, channels: int, grace: int = 0,
                 split_repeats: bool = False, quantize: str = "round"):
        lib = _load()
        assert lib is not None, "native library unavailable"
        assert quantize in ("floor", "round"), quantize
        self._lib = lib
        self.channels = channels
        self._h = lib.lora_pyramid_multi_create(
            channels, cfg.sf, cfg.p, cfg.fft_factor, int(cfg.ldr),
            cfg.threshold, grace, int(split_repeats),
            int(quantize == "round"))
        if not self._h:
            raise MemoryError("lora_pyramid_multi_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.lora_pyramid_multi_destroy(h)
            self._h = None

    def feed(self, bins, h, h_single, valid) -> None:
        """bins int32[C, H, M], h/h_single float32[C, H, M],
        valid bool[C, H, M] — one device block for every channel."""
        import ctypes as _ct
        b = np.ascontiguousarray(bins, np.int32)
        hh = np.ascontiguousarray(h, np.float32)
        hs = np.ascontiguousarray(h_single, np.float32)
        v = np.ascontiguousarray(valid, np.uint8)
        c, nh, mp = b.shape
        assert c == self.channels, (c, self.channels)
        self._lib.lora_pyramid_multi_feed(
            self._h,
            b.ctypes.data_as(_ct.POINTER(_ct.c_int32)),
            hh.ctypes.data_as(_ct.POINTER(_ct.c_float)),
            hs.ctypes.data_as(_ct.POINTER(_ct.c_float)),
            v.ctypes.data_as(_ct.POINTER(_ct.c_uint8)),
            c, nh, mp)

    def flush_hops(self) -> int:
        return int(self._lib.lora_pyramid_multi_flush_hops(self._h))

    def drain(self) -> list[tuple[int, int, np.ndarray]]:
        """All finished packets as (channel, position, symbols) tuples;
        position is the preamble sample index (mod 2^28)."""
        import ctypes as _ct
        out = []
        buf = np.zeros(4096, np.uint16)
        ts = _ct.c_int64(0)
        for c in range(self.channels):
            while self._lib.lora_pyramid_multi_pending(self._h, c) > 0:
                n = self._lib.lora_pyramid_multi_pop_ts(
                    self._h, c,
                    buf.ctypes.data_as(_ct.POINTER(_ct.c_uint16)), len(buf),
                    _ct.byref(ts))
                if n == -2:      # packet larger than buffer: grow and retry
                    buf = np.zeros(len(buf) * 2, np.uint16)
                    continue
                if n < 0:
                    break
                out.append((c, int(ts.value), buf[:n].copy()))
        return out

    def stats(self) -> dict:
        import ctypes as _ct
        s = np.zeros(3, np.int64)
        self._lib.lora_pyramid_multi_stats(
            self._h, s.ctypes.data_as(_ct.POINTER(_ct.c_int64)))
        return {"tracks_dropped": int(s[0]), "packets_dropped": int(s[1]),
                "tracks_overflow_finalized": int(s[2])}
