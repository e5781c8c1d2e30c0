"""Minimal LMDB *writer* — test twin for locate_tpu/data/lmdb_reader.py.

Writes a complete, single-commit LMDB data file (meta pages, B+tree of
branch/leaf pages, overflow pages for big values) following the same
on-disk layout the reader documents. Kept in tests/ because production
code never writes LMDB; it exists so the reader can be exercised against
freshly constructed trees of any depth without the `lmdb` package. Where
that package IS available, test_lmdb.py additionally cross-checks both
directions against the real C library — the two writers must agree on
every byte the reader interprets.
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, List, Tuple

MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
HDR = 16
INVALID = 0xFFFFFFFFFFFFFFFF


def _even(n: int) -> int:
    return (n + 1) & ~1


class _Tree:
    def __init__(self, psize: int):
        self.psize = psize
        self.pages: List[bytes] = [b"", b""]  # meta slots filled last
        self.n_branch = self.n_leaf = self.n_over = 0

    def add_page(self, data: bytes) -> int:
        assert len(data) == self.psize
        self.pages.append(data)
        return len(self.pages) - 1

    def node_page(self, flags: int, nodes: List[bytes]) -> int:
        """Assemble one branch/leaf page: ptrs ascending from the header,
        node bodies packed downward from the page end (LMDB's layout)."""
        psize = self.psize
        ptrs, blob_parts = [], []
        upper = psize
        for nd in nodes:
            upper -= _even(len(nd))
            ptrs.append(upper)
        body = bytearray(psize)
        pgno = len(self.pages)
        lower = HDR + 2 * len(nodes)
        assert lower <= upper, "page overfull"
        struct.pack_into("<QHHHH", body, 0, pgno, 0, flags, lower, upper)
        struct.pack_into(f"<{len(nodes)}H", body, HDR, *ptrs)
        for ptr, nd in zip(ptrs, nodes):
            body[ptr : ptr + len(nd)] = nd
        if flags & P_BRANCH:
            self.n_branch += 1
        else:
            self.n_leaf += 1
        return self.add_page(bytes(body))

    def overflow(self, data: bytes) -> int:
        npages = (HDR - 1 + len(data)) // self.psize + 1
        first = len(self.pages)
        blob = bytearray(npages * self.psize)
        struct.pack_into("<QHHI", blob, 0, first, 0, P_OVERFLOW, npages)
        blob[HDR : HDR + len(data)] = data
        for i in range(npages):
            self.add_page(bytes(blob[i * self.psize : (i + 1) * self.psize]))
        self.n_over += npages
        return first


def write_lmdb(
    path: str,
    records: Iterable[Tuple[bytes, bytes]],
    psize: int = 4096,
) -> str:
    """Write `records` as one committed LMDB environment. `path` is a
    directory (gets `data.mdb` inside — LMDB's subdir mode, LSUN's layout)
    or an explicit `.mdb` file path. Returns the data file path."""
    recs = sorted(records)
    keys = [k for k, _ in recs]
    assert len(set(keys)) == len(keys), "duplicate keys"
    t = _Tree(psize)
    nodemax = ((psize - HDR) // 2) & ~1  # mdb.c me_nodemax

    # ---- leaves ----
    leaf_nodes: List[bytes] = []
    for k, v in recs:
        if 8 + len(k) + len(v) > nodemax:
            ov = t.overflow(v)
            nd = struct.pack("<HHHH", len(v) & 0xFFFF, len(v) >> 16,
                             F_BIGDATA, len(k)) + k + struct.pack("<Q", ov)
        else:
            nd = struct.pack("<HHHH", len(v) & 0xFFFF, len(v) >> 16,
                             0, len(k)) + k + v
        leaf_nodes.append(nd)

    def pack_level(nodes: List[bytes], firsts: List[bytes], flags: int):
        """Greedy-fill pages; returns [(pgno, first_key)]."""
        out, cur, cur_first, used = [], [], None, HDR
        for nd, fk in zip(nodes, firsts):
            cost = 2 + _even(len(nd))
            if cur and used + cost > psize:
                out.append((t.node_page(flags, cur), cur_first))
                cur, used = [], HDR
            if not cur:
                cur_first = fk
            cur.append(nd)
            used += cost
        if cur or not out:
            out.append((t.node_page(flags, cur), cur_first or b""))
        return out

    level = pack_level(leaf_nodes, keys, P_LEAF)
    depth = 1
    while len(level) > 1:
        bnodes, bfirsts = [], []
        for i, (pgno, fk) in enumerate(level):
            k = b"" if i == 0 else fk  # node 0's key is unused in LMDB
            bnodes.append(
                struct.pack("<HHHH", pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                            (pgno >> 32) & 0xFFFF, len(k)) + k
            )
            bfirsts.append(fk)
        # pack branch nodes page-by-page; node 0 of EVERY branch page gets
        # its key blanked below (LMDB leaves the first separator unused)
        out, cur, cur_first, used = [], [], None, HDR
        for nd, fk in zip(bnodes, bfirsts):
            cost = 2 + _even(len(nd))
            if cur and used + cost > psize:
                out.append((cur, cur_first))
                cur, used = [], HDR
            if not cur:
                cur_first = fk
            cur.append(nd)
            used += cost
        out.append((cur, cur_first))
        level = []
        for nodes, fk in out:
            # blank the first node's key inside each page
            lo, hi, fl, ks = struct.unpack_from("<HHHH", nodes[0])
            nodes[0] = struct.pack("<HHHH", lo, hi, fl, 0)
            level.append((t.node_page(P_BRANCH, nodes), fk))
        depth += 1

    root = level[0][0] if recs else INVALID
    if not recs:
        depth = 0
        t.pages = t.pages[:2]  # no tree pages at all
        t.n_leaf = 0

    # ---- metas ----
    last_pg = max(len(t.pages) - 1, 1)

    def meta(pgno: int, txnid: int) -> bytes:
        b = bytearray(psize)
        struct.pack_into("<QHHHH", b, 0, pgno, 0, P_META, 0, 0)
        struct.pack_into("<IIQQ", b, HDR, MAGIC, 1, 0,
                         max(psize * (last_pg + 1), 1 << 20))
        # FREE db: pad carries the page size (mm_psize alias)
        struct.pack_into("<IHHQQQQQ", b, HDR + 24, psize, 0, 0, 0, 0, 0, 0,
                         INVALID)
        struct.pack_into("<IHHQQQQQ", b, HDR + 72, 0, 0, depth,
                         t.n_branch, t.n_leaf, t.n_over, len(recs), root)
        struct.pack_into("<QQ", b, HDR + 120, last_pg, txnid)
        return bytes(b)

    t.pages[0] = meta(0, 1)
    t.pages[1] = meta(1, 0)

    if path.endswith(".mdb"):
        out_path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)
        out_path = os.path.join(path, "data.mdb")
    with open(out_path, "wb") as f:
        for p in t.pages:
            f.write(p)
    return out_path
