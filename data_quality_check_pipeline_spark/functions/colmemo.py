"""Session-scoped memo for built Column expression trees.

Building a Column costs one py4j round trip per ``F.*`` call, so the
big static expression builders — the validation rule stack, the audio
window extraction, the scrub/mask chains — spend real DRIVER time per
invocation rebuilding trees that depend only on their (string)
arguments. Measured r06 on the bench clips row: ~0.8 s of every warm
pass was pure driver-side expression construction (rule stack alone
0.13-0.16 s, audio window exprs ~0.15 s), i.e. time no executor ever
sees. Columns are immutable, *unresolved* expression trees, so one
build per JVM is safe to reuse across any number of DataFrames and
queries — this memoizes plan metadata, never data or results (the same
class of memo as ``__spark_entry__._SCAN_PARTS`` and the IVF
``_cents_lit`` literal).

Staleness contract: the memo is keyed to the ACTIVE SparkContext by
object identity and clears itself whenever a different context becomes
active — a Column built against a stopped JVM's gateway must never be
served under a new one (the test suite starts/stops sessions within a
single process). Entries hold strong references to their values for
the context's lifetime; every builder memoized through here produces a
bounded, enumerable key set (function name + string args), so the memo
cannot grow with data.

Callers MUST treat memoized return values (and any list/dict structure
inside them) as immutable — they are shared across call sites.
"""

from __future__ import annotations

import functools
import threading
import weakref

_lock = threading.Lock()
_ctx_ref: weakref.ref | None = None
_memo: dict = {}


def memoized_cols(key, build):
    """Return ``build()`` memoized under ``key`` for the current
    SparkContext's lifetime. ``key`` must capture every input the built
    tree depends on. Falls through to a plain build when no context is
    active (expression building without a JVM fails anyway; the memo
    never masks that)."""
    global _ctx_ref, _memo
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return build()
    with _lock:
        if _ctx_ref is None or _ctx_ref() is not sc:
            # different (or first) live context: drop every tree built
            # against the previous gateway
            _memo = {}
            _ctx_ref = weakref.ref(sc)
        if key in _memo:
            return _memo[key]
    # build OUTSIDE the lock: py4j round trips are slow and parallel
    # query-leg builders (see __spark_entry__) must not serialize on
    # unrelated keys. A benign double-build races to setdefault.
    v = build()
    with _lock:
        if _ctx_ref is not None and _ctx_ref() is sc:
            return _memo.setdefault(key, v)
    return v


def memo_cols(fn):
    """Decorator: memoize a Column-building function per SparkContext
    when every argument is hashable (string column names, numbers,
    flags). Calls with unhashable arguments — Column objects, lists —
    build directly, preserving exact pass-through semantics."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        key = (fn.__module__, fn.__qualname__, args,
               tuple(sorted(kwargs.items())))
        try:
            hash(key)
        except TypeError:
            return fn(*args, **kwargs)
        return memoized_cols(key, lambda: fn(*args, **kwargs))

    return wrapper
