"""ctypes bindings for the native (C++) graph-layout builders.

Loads ``native/libblocked_builder.so`` and
``native/libgrouped_builder.so`` (auto-compiling with g++ on first use
if the checkout has no prebuilt artifact) and exposes
``build_blocked_native`` / ``build_grouped_native`` with the exact
output contracts of the NumPy paths in graph/blocked.py and
graph/grouped.py.  Callers fall back to NumPy when no compiler is
available (``is_available()`` / ``grouped_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "blocked_builder.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libblocked_builder.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) and os.path.exists(_SRC):
            try:
                subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                                "-o", _SO, _SRC], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_SO):
            return None
        lib = ctypes.CDLL(_SO)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.bb_plan.restype = ctypes.c_void_p
        lib.bb_plan.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.bb_num_chunks.restype = ctypes.c_int64
        lib.bb_num_chunks.argtypes = [ctypes.c_void_p]
        lib.bb_fill.restype = None
        lib.bb_fill.argtypes = [ctypes.c_void_p, i32p, i32p, f32p,
                                i32p, i32p, i32p]
        lib.bb_free.restype = None
        lib.bb_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def is_available() -> bool:
    return _load() is not None


_GLOCK = threading.Lock()
_GLIB: Optional[ctypes.CDLL] = None
_GTRIED = False

_GSRC = os.path.join(os.path.dirname(_SRC), "grouped_builder.cc")
_GSO = os.path.join(os.path.dirname(_SRC), "libgrouped_builder.so")


def _gload() -> Optional[ctypes.CDLL]:
    global _GLIB, _GTRIED
    with _GLOCK:
        if _GLIB is not None or _GTRIED:
            return _GLIB
        _GTRIED = True
        stale = (os.path.exists(_GSO) and os.path.exists(_GSRC)
                 and os.path.getmtime(_GSRC) > os.path.getmtime(_GSO))
        if (stale or not os.path.exists(_GSO)) and os.path.exists(_GSRC):
            try:
                subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                                "-o", _GSO, _GSRC], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_GSO):
            return None
        lib = ctypes.CDLL(_GSO)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        try:
            lib.gb3_plan
        except AttributeError:   # stale prebuilt artifact, old ABI
            return None
        lib.gb3_plan.restype = ctypes.c_void_p
        lib.gb3_plan.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.gb3_num_chunks.restype = ctypes.c_int64
        lib.gb3_num_chunks.argtypes = [ctypes.c_void_p]
        lib.gb3_num_live.restype = ctypes.c_int64
        lib.gb3_num_live.argtypes = [ctypes.c_void_p]
        lib.gb3_num_trans.restype = ctypes.c_int64
        lib.gb3_num_trans.argtypes = [ctypes.c_void_p]
        lib.gb3_fill.restype = None
        lib.gb3_fill.argtypes = [ctypes.c_void_p, i32p, i32p, f32p,
                                 i32p, i32p, i32p, i32p, i32p]
        lib.gb3_free.restype = None
        lib.gb3_free.argtypes = [ctypes.c_void_p]
        _GLIB = lib
        return _GLIB


def grouped_available() -> bool:
    return _gload() is not None


def build_grouped_native(src, dst, val, n_src: int, n_dst: int,
                         sub: int, tile_dst: int, groups_per_chunk: int,
                         span: int, window: int, lead: int):
    """Returns (g_src, g_dst, g_val, g_eid, g_meta, trans_sb, c_dt,
    c_first, n_live) numpy arrays with the same contract as
    graph/grouped.py's NumPy builder, or None if the native library is
    unavailable."""
    lib = _gload()
    if lib is None:
        return None

    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    val = np.ascontiguousarray(val, np.float32)

    def _p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    h = lib.gb3_plan(_p(src, ctypes.c_int32), _p(dst, ctypes.c_int32),
                     _p(val, ctypes.c_float), len(src), n_src, n_dst,
                     sub, tile_dst, groups_per_chunk, span, window, lead)
    try:
        from dream_gnn_tpu.graph.grouped import p0_bits_for

        c = max(int(lib.gb3_num_chunks(h)), 1)
        n_trans = int(lib.gb3_num_trans(h))
        shift = p0_bits_for(span) + min(window, span)
        if n_trans << shift >= 1 << 31:
            raise ValueError(
                f"{n_trans} panel transitions with span={span}/"
                f"window={window} overflow the packed int32 schedule; "
                f"use a smaller span")
        g_src = np.zeros((c, groups_per_chunk, sub), np.int32)
        g_dst = np.zeros((c, groups_per_chunk, sub), np.int32)
        g_val = np.zeros((c, groups_per_chunk, sub), np.float32)
        g_eid = np.full((c, groups_per_chunk, sub),
                        int(lib.gb3_num_live(h)), np.int32)
        g_meta = np.full((c * groups_per_chunk,),
                         np.iinfo(np.int32).min, np.int32)
        trans_sb = np.full((n_trans + lead,), -1, np.int32)
        c_dt = np.zeros((c,), np.int32)
        c_first = np.zeros((c,), np.int32)
        if lib.gb3_num_chunks(h) > 0:
            lib.gb3_fill(h, _p(g_src, ctypes.c_int32),
                         _p(g_dst, ctypes.c_int32),
                         _p(g_val, ctypes.c_float),
                         _p(g_eid, ctypes.c_int32),
                         _p(g_meta, ctypes.c_int32),
                         _p(trans_sb, ctypes.c_int32),
                         _p(c_dt, ctypes.c_int32),
                         _p(c_first, ctypes.c_int32))
        else:
            c_first[0] = 1
        return (g_src, g_dst, g_val, g_eid, g_meta, trans_sb, c_dt,
                c_first, int(lib.gb3_num_live(h)))
    finally:
        lib.gb3_free(h)


def build_blocked_native(src, dst, val, n_src: int, n_dst: int,
                         tile_src: int, tile_dst: int, edge_chunk: int):
    """Returns (c_src, c_dst, c_val, c_st, c_dt, c_first) numpy arrays
    with the same contract as the NumPy builder, or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None

    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    val = np.ascontiguousarray(val, np.float32)

    def _p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    h = lib.bb_plan(_p(src, ctypes.c_int32), _p(dst, ctypes.c_int32),
                    _p(val, ctypes.c_float), len(src), n_src, n_dst,
                    tile_src, tile_dst, edge_chunk)
    try:
        c = lib.bb_num_chunks(h)
        c = max(int(c), 1)
        c_src = np.zeros((c, edge_chunk), np.int32)
        c_dst = np.zeros((c, edge_chunk), np.int32)
        c_val = np.zeros((c, edge_chunk), np.float32)
        c_st = np.zeros((c,), np.int32)
        c_dt = np.zeros((c,), np.int32)
        c_first = np.zeros((c,), np.int32)
        if lib.bb_num_chunks(h) > 0:
            lib.bb_fill(h, _p(c_src, ctypes.c_int32),
                        _p(c_dst, ctypes.c_int32),
                        _p(c_val, ctypes.c_float),
                        _p(c_st, ctypes.c_int32),
                        _p(c_dt, ctypes.c_int32),
                        _p(c_first, ctypes.c_int32))
        return c_src, c_dst, c_val, c_st, c_dt, c_first
    finally:
        lib.bb_free(h)
