"""Vectorized (batch-at-a-time) char n-gram hashing shared by the langid and
perplexity scorers.

The reference scores text row-at-a-time in Python loops
(/root/reference/src/validator.py:63 style); here a whole Arrow batch of
strings is processed with numpy only:

1. utf-8 encode the batch and concatenate into ONE uint8 array,
2. compute rolling trigram hashes with three shifted vectorized slices,
3. mask out trigrams that would span row boundaries,
4. map every trigram position to its row id,
5. per-row reductions via ``np.add.reduceat`` (order within a row is fixed,
   so results are bit-identical regardless of Arrow batch boundaries).

No per-row Python anywhere in the hot path — required by the north rule.
"""

from __future__ import annotations

import numpy as np

N_BUCKETS = 1 << 18  # hashed feature space, fastText-style
_P1 = np.uint64(1_000_003)
_P2 = np.uint64(1_000_033)


def encode_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Encode an iterable of strings (None -> "") into one uint8 array plus
    per-row byte lengths. The only Python-level loop is the C-level
    ``str.encode`` + ``bytes.join``."""
    encoded = [(t or "").lower().encode("utf-8") for t in texts]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64,
                          count=len(encoded))
    big = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    return big, lengths


def trigram_hashes(
    big: np.ndarray, lengths: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Hashed char-trigram ids + owning row id for every valid trigram.

    Returns (hashes int64 in [0, N_BUCKETS), row_ids int64), position-ordered
    (all trigrams of row i precede those of row i+1).
    """
    total = int(big.size)
    n_rows = int(lengths.size)
    if total < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    b = big.astype(np.uint64)
    h = b[:-2] * _P1 * _P2 + b[1:-1] * _P1 + b[2:]  # wrap-around mod 2^64 ok

    # start offset of each row in the concatenation
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    ends = starts + lengths

    # a trigram starting at position p belongs to row i iff p+3 <= ends[i]
    pos = np.arange(total - 2, dtype=np.int64)
    row_of_pos = np.searchsorted(ends, pos, side="right")
    valid = pos + 3 <= ends[row_of_pos]

    hashes = (h[valid] % np.uint64(N_BUCKETS)).astype(np.int64)
    return hashes, row_of_pos[valid]


def row_sums(
    values: np.ndarray, row_ids: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sum ``values`` grouped by (sorted, position-ordered) ``row_ids``.
    Returns (sums float64[n_rows], counts int64[n_rows]); empty rows get 0."""
    sums = np.zeros(n_rows, dtype=np.float64)
    counts = np.zeros(n_rows, dtype=np.int64)
    if row_ids.size == 0:
        return sums, counts
    # boundaries where the row id changes
    change = np.flatnonzero(np.diff(row_ids)) + 1
    starts = np.concatenate(([0], change))
    present = row_ids[starts]
    seg_sums = np.add.reduceat(values.astype(np.float64), starts)
    seg_counts = np.diff(np.concatenate((starts, [row_ids.size])))
    sums[present] = seg_sums
    counts[present] = seg_counts
    return sums, counts
