"""Prototype A/B for VERDICT r15 item #2: an Arrow mapInPandas minhash
signature kernel (numpy-vectorized single-block md5, in-kernel per-doc
min) vs the current codegen explode+SortAggregate path.

Measures, on REAL corpus documents:
  1. numpy-md5 correctness vs hashlib (sample)
  2. whole-kernel throughput on a driver-side batch of docs
  3. projected x100 kernel time vs the measured JVM signature time
"""
import os
import re
import sys
import time
import hashlib

import numpy as np

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
sys.path.insert(0, "/root/repo")

# --- single-block md5, vectorized over N messages ---------------------
_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_K = [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)]
_G = ([i for i in range(16)]
     + [(5 * i + 1) % 16 for i in range(16)]
     + [(3 * i + 5) % 16 for i in range(16)]
     + [(7 * i) % 16 for i in range(16)])


def md5_1block_np(block_words):
    """block_words: (N, 16) uint32 little-endian message blocks
    (pre-padded). Returns 4 x (N,) uint32 state words."""
    A = np.full(len(block_words), 0x67452301, np.uint32)
    B = np.full(len(block_words), 0xefcdab89, np.uint32)
    C = np.full(len(block_words), 0x98badcfe, np.uint32)
    D = np.full(len(block_words), 0x10325476, np.uint32)
    a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        tmp = f + a + np.uint32(_K[i]) + block_words[:, _G[i]]
        s = _S[i]
        rot = (tmp << np.uint32(s)) | (tmp >> np.uint32(32 - s))
        a, d, c, b = d, c, b, (b + rot)
    return A + a, B + b, C + c, D + d


def pack_1block(msgs):
    """msgs: list of bytes, each <= 55 bytes. Returns (N,16) uint32 LE
    padded blocks."""
    n = len(msgs)
    buf = np.zeros((n, 64), np.uint8)
    lens = np.empty(n, np.int64)
    for i, m in enumerate(msgs):
        L = len(m)
        buf[i, :L] = np.frombuffer(m, np.uint8)
        buf[i, L] = 0x80
        lens[i] = L
    bits = (lens * 8).astype("<u8")
    buf[:, 56:64] = bits.view(np.uint8).reshape(n, 8)
    return buf.view("<u4")


def two_lanes(A, B, C, D):
    """hex[0:15] and hex[15:30] as int64 lanes from LE state words."""
    # digest bytes = LE(A) LE(B) LE(C) LE(D); hex chars are per-byte
    b0 = A.astype("<u4").view(np.uint8).reshape(-1, 4)
    b1 = B.astype("<u4").view(np.uint8).reshape(-1, 4)
    b2 = C.astype("<u4").view(np.uint8).reshape(-1, 4)
    b3 = D.astype("<u4").view(np.uint8).reshape(-1, 4)
    dig = np.concatenate([b0, b1, b2, b3], axis=1).astype(np.uint64)
    u1 = np.zeros(len(dig), np.uint64)
    for k in range(8):
        u1 = (u1 << np.uint64(8)) | dig[:, k]
    v1 = (u1 >> np.uint64(4)).astype(np.int64)
    u2 = np.zeros(len(dig), np.uint64)
    for k in range(7, 15):
        u2 = (u2 << np.uint64(8)) | dig[:, k]
    v2 = (u2 & np.uint64((1 << 60) - 1)).astype(np.int64)
    return v1, v2


# correctness vs hashlib
msgs = [f"{i}|lorem ipsum dolor w{i}".encode() for i in range(1000)]
blocks = pack_1block(msgs)
A, B, C, D = md5_1block_np(blocks)
v1, v2 = two_lanes(A, B, C, D)
for i in (0, 1, 500, 999):
    h = hashlib.md5(msgs[i]).hexdigest()
    assert int(h[0:15], 16) == v1[i] and int(h[15:30], 16) == v2[i], i
print("numpy-md5 parity with hashlib: OK", flush=True)

# raw md5 throughput (the irreducible kernel cost)
big = msgs * 200  # 200k messages
t0 = time.monotonic()
blocks = pack_1block(big)
t_pack = time.monotonic() - t0
t0 = time.monotonic()
A, B, C, D = md5_1block_np(blocks)
v1, v2 = two_lanes(A, B, C, D)
t_md5 = time.monotonic() - t0
rate = len(big) / (t_pack + t_md5)
print({"n_msgs": len(big), "pack_s": round(t_pack, 2),
       "md5_s": round(t_md5, 2),
       "rate_per_core": int(rate)}, flush=True)

# whole-kernel timing on real documents (driver-side, single core):
# normalize + split + shingles + 6 prefixed messages/shingle + numpy
# md5 + per-doc min over 12 lanes
import pyarrow.parquet as pq
tbl = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                    columns=["doc_id", "text"])
texts = tbl.column("text").to_pylist()[:10000]
ids = tbl.column("doc_id").to_pylist()[:10000]
_ws = re.compile(r"\s+")


def kernel(ids, texts):
    out = np.full((len(ids), 12), (1 << 62), np.int64)
    all_msgs, doc_idx = [], []
    for di, t in enumerate(texts):
        w = _ws.sub(" ", (t or "").strip().lower()).split(" ")
        if len(w) < 3:
            continue
        shs = [" ".join(w[j:j + 3]) for j in range(len(w) - 2)]
        for i in range(6):
            p = f"{i}|"
            all_msgs.extend((p + s).encode() for s in shs)
            doc_idx.extend([di * 6 + i] * len(shs))
    blocks = pack_1block(all_msgs)
    A, B, C, D = md5_1block_np(blocks)
    v1, v2 = two_lanes(A, B, C, D)
    gi = np.array(doc_idx, np.int64)
    # per (doc, hash-fn) min via np.minimum.at on flattened lanes
    m1 = np.full(len(ids) * 6, (1 << 62), np.int64)
    m2 = np.full(len(ids) * 6, (1 << 62), np.int64)
    np.minimum.at(m1, gi, v1)
    np.minimum.at(m2, gi, v2)
    return len(all_msgs)


t0 = time.monotonic()
n_msgs = kernel(ids, texts)
dt = time.monotonic() - t0
print({"docs": len(ids), "msgs": n_msgs, "kernel_s": round(dt, 2),
       "msgs_per_core_s": int(n_msgs / dt)}, flush=True)
# projection to x100: 156.4M messages over 32 cores
proj = 156_422_400 / (n_msgs / dt) / 32
print({"x100_projected_kernel_s": round(proj, 1),
       "x100_measured_jvm_sig_s": "10.0-13.7 (median ~10)"})
