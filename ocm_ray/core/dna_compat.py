"""DNA/FASTA compatibility codec — parity-harness only.

The engine's native input is the pre-tokenized Parquet table
(``tokens: list<int32>``). This module exists solely so conformance tests
can drive the *reference binaries* on FASTA fixtures and feed the engine
the identical uint64 item stream (SURVEY §5.3: bit-exact parity requires
emulating the reference reader's chunked stale-tail quirk, which must NOT
leak into the engine proper).

Reference semantics reimplemented (not copied):
  * 2-bit base codes A=00, T=01, G=10, C=11 — note the nonstandard
    ordering (``main.cpp:138-167``); non-ACGT characters are silently
    skipped by the query-side codec (source of the documented N-aliasing).
  * rolling window: ``kmer = (kmer << 2 | code) & (4^k - 1)`` once the
    window is full (``include/ocm.h:85-105``; mask ``:532``).
  * canonical mode emits the reverse complement as a second update per
    window (``include/ocm.h:107-137,578``).
  * the chunked reader (``include/ocm.h:526-584``) reads 100,000-byte
    chunks under ``while(!eof())`` and always scans the full buffer, so a
    short final read re-scans the stale tail of the previous chunk;
    ``emulate_stale_tail=True`` reproduces that byte stream exactly.
"""

from __future__ import annotations

from typing import List

import numpy as np

_CODE = {65: 0, 84: 1, 71: 2, 67: 3}  # A T G C


def encode_kmer(s: str) -> int:
    """Query-side codec (``main.cpp:138-167``): 2-bit-pack, silently
    skipping non-ACGT characters (aliasing quirk preserved on purpose)."""
    k = 0
    for ch in s.encode("ascii"):
        c = _CODE.get(ch)
        if c is not None:
            k = ((k << 2) | c) & 0xFFFFFFFFFFFFFFFF
    return k


def reverse_complement(kmer: int, k: int) -> int:
    """Reverse complement under the reference's code table
    (``include/ocm.h:107-137``): complement pairs are (A=00 ↔ T=01) and
    (G=10 ↔ C=11), i.e. code ^ 1, emitted in reversed base order."""
    out = 0
    for _ in range(k):
        out = ((out << 2) | ((kmer & 3) ^ 1)) & 0xFFFFFFFFFFFFFFFF
        kmer >>= 2
    return out


def _reader_byte_stream(data: bytes, chunk_size: int) -> bytes:
    """The byte sequence the reference's chunked reader actually scans:
    full chunks verbatim; the final short read leaves the previous chunk's
    tail in the buffer and the scan still covers all ``chunk_size`` bytes.
    Requires ``len(data) >= chunk_size`` for determinism (else the C++
    buffer tail is uninitialized stack)."""
    n = len(data)
    if n % chunk_size == 0:
        # Final read() hits EOF with gcount==0: buffer keeps the last full
        # chunk and is scanned once more in its entirety.
        return data + data[-chunk_size:]
    full_end = (n // chunk_size) * chunk_size
    tail = data[full_end:]
    prev = data[full_end - chunk_size:full_end]
    return data[:full_end] + tail + prev[len(tail):]


def kmer_stream_from_fasta(data: bytes, k: int, canonicalize: bool = True,
                           chunk_size: int = 100000,
                           emulate_stale_tail: bool = True) -> np.ndarray:
    """Exact update stream the reference feeds its sketch: one uint64 per
    emitted window (two per window when canonical). Pure-Python char loop —
    fixtures are small; the engine never runs this."""
    if emulate_stale_tail and len(data) >= chunk_size:
        data = _reader_byte_stream(data, chunk_size)
    out: List[int] = []
    kmer = 0
    cur = 0
    in_header = False
    mask = (1 << (2 * k)) - 1
    skip_until = 0
    for i, ch in enumerate(data):
        if i < skip_until:
            continue
        if ch == 0xFF:
            # the reader's `if(ch==EOF) break` (ocm.h:544) exits ONLY the
            # inner while(i<chunk_size) scan — the outer read loop
            # continues with the next chunk, k-mer state intact. Skip to
            # the next chunk boundary, not the end of the stream.
            skip_until = ((i // chunk_size) + 1) * chunk_size
            continue
        if ch == 0x3E:  # '>'
            in_header = True
            kmer = 0
            cur = 0
            continue
        if in_header:
            if ch == 0x0A:
                in_header = False
            continue
        if ch in (0x0A, 0x0D, 0x20):
            continue
        if ch == 0x4E:  # 'N'
            kmer = 0
            cur = 0
            continue
        code = _CODE.get(ch)
        if code is None:
            # addChar's switch has no default: unknown chars leave the
            # window unshifted but still count toward emission only via
            # current_len when short -- reference keeps k_mer unchanged and
            # (when short) increments nothing. Reproduce: no-op on kmer,
            # but the reference DOES fall into the emit branch; emulate.
            if cur < k:
                cur += 1
            if cur == k:
                out.append(kmer)
                if canonicalize:
                    out.append(reverse_complement(kmer, k))
            continue
        if cur < k:
            kmer = ((kmer << 2) | code) & 0xFFFFFFFFFFFFFFFF
            cur += 1
        else:
            kmer = (((kmer << 2) | code)) & mask
        if cur == k:
            out.append(kmer)
            if canonicalize:
                out.append(reverse_complement(kmer, k))
    return np.array(out, dtype=np.uint64)


def random_fasta(n_reads: int, read_len: int, seed: int = 42,
                 line_width: int = 0) -> bytes:
    """Deterministic ACGT FASTA for parity fixtures (>=100 KB recommended)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    parts: List[bytes] = []
    for i in range(n_reads):
        seq = bases[rng.integers(0, 4, size=read_len)].tobytes()
        if line_width:
            seq = b"\n".join(seq[j:j + line_width] for j in range(0, len(seq), line_width))
        parts.append(b">read%d\n" % i + seq + b"\n")
    return b"".join(parts)
