"""Minimal Compound File Binary (OLE2) reader — MS-CFB public spec.

Legacy Office formats (.doc/.xls/.ppt/.msg/.vsd) are CFB containers: a FAT
filesystem-in-a-file of named streams.  The reference's solrCell corpus
(mlt/resources/test-documents/) feeds these to Tika; this reader provides
the container layer for the builtin extractors in ``documents.py``.

Scope: read-only, version 3 (512-byte sectors) and version 4 (4096),
FAT + miniFAT chains, red-black directory read linearly.  No write
support, no encryption.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_MAGIC = bytes.fromhex("d0cf11e0a1b11ae1")
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_MAXREGSECT = 0xFFFFFFFA


@dataclass
class DirEntry:
    name: str
    type: int  # 1=storage, 2=stream, 5=root
    start: int
    size: int


class CfbFile:
    def __init__(self, data: bytes):
        if len(data) < 512 or not data.startswith(_MAGIC):
            raise ValueError("not a CFB (OLE2) file")
        self.data = data
        (self.major,) = struct.unpack_from("<H", data, 0x1A)
        (self.sector_shift,) = struct.unpack_from("<H", data, 0x1E)
        (self.mini_shift,) = struct.unpack_from("<H", data, 0x20)
        # MS-CFB 2.2: sector shift MUST be 9 (v3) or 12 (v4), mini 6 —
        # anything else is a corrupt/hostile header; without the check a
        # garbage shift (say 31) sizes every later read off a 2 GB
        # "sector" and fails with an opaque struct.error deep in FAT
        # parsing (or allocates absurdly) instead of a loud type error
        if self.sector_shift not in (9, 12) or self.mini_shift != 6:
            raise ValueError(
                f"corrupt CFB header: sector shift {self.sector_shift}, "
                f"mini shift {self.mini_shift}"
            )
        (self.n_fat,) = struct.unpack_from("<I", data, 0x2C)
        (self.first_dir,) = struct.unpack_from("<I", data, 0x30)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 0x38)
        (self.first_minifat,) = struct.unpack_from("<I", data, 0x3C)
        (self.n_minifat,) = struct.unpack_from("<I", data, 0x40)
        (self.first_difat,) = struct.unpack_from("<I", data, 0x44)
        (self.n_difat,) = struct.unpack_from("<I", data, 0x48)
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        # every chain walk is bounded by the number of sectors that can
        # physically exist in the payload — header counts (n_minifat,
        # n_difat) are attacker-controlled and a cyclic FAT otherwise
        # turns a bounded loop into a memory-blowup hang
        self.max_sectors = len(data) // self.ssz + 1
        self.fat = self._read_fat()
        self.minifat = self._read_minifat()
        self.entries = self._read_dir()
        root = next((e for e in self.entries if e.type == 5), None)
        if root is None:
            raise ValueError("CFB has no root directory entry")
        self.mini_stream = self._read_chain(root.start, root.size)

    # -- sector plumbing -------------------------------------------------
    def _sector(self, sid: int) -> bytes:
        off = self.ssz * (sid + 1)
        return self.data[off : off + self.ssz]

    def _sids(self, sid: int) -> tuple:
        """Sector-ids packed in a FAT/DIFAT/miniFAT sector — whole
        4-byte words only, so a sector truncated by a short file yields
        the ids it holds instead of a struct.error five frames deep."""
        sec = self._sector(sid)
        n = len(sec) // 4
        return struct.unpack(f"<{n}I", sec[: n * 4])

    def _read_fat(self) -> list[int]:
        difat: list[int] = list(struct.unpack_from("<109I", self.data, 0x4C))
        sid = self.first_difat
        per = self.ssz // 4 - 1
        # bound by physical sector count, not the header's n_difat: a
        # lying count plus a cyclic next-pointer otherwise appends ~127
        # entries per iteration for 4 billion iterations
        for _ in range(min(self.n_difat, self.max_sectors)):
            if sid > _MAXREGSECT:
                break
            vals = self._sids(sid)
            if len(vals) < per + 1:  # truncated: no next-pointer word
                difat.extend(vals)
                break
            difat.extend(vals[:-1])
            sid = vals[-1]
        fat: list[int] = []
        for fsid in difat:
            if fsid > _MAXREGSECT:
                continue
            fat.extend(self._sids(fsid))
        return fat

    def _read_minifat(self) -> list[int]:
        out: list[int] = []
        sid = self.first_minifat
        guard = 0
        # same cycle bound as _read_fat: n_minifat is header-claimed
        while (sid <= _MAXREGSECT and guard < self.max_sectors
               and len(out) // (self.ssz // 4) < self.n_minifat):
            got = self._sids(sid)
            if not got:
                break
            out.extend(got)
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN
            guard += 1
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid = start
        guard = 0
        while sid <= _MAXREGSECT and guard <= len(self.fat) + 1:
            out += self._sector(sid)
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN
            guard += 1
        return bytes(out[:size])

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid = start
        guard = 0
        while sid <= _MAXREGSECT and guard <= len(self.minifat) + 1:
            off = sid * self.mssz
            out += self.mini_stream[off : off + self.mssz]
            sid = self.minifat[sid] if sid < len(self.minifat) else _ENDOFCHAIN
            guard += 1
        return bytes(out[:size])

    def _read_dir(self) -> list[DirEntry]:
        raw = self._read_chain(self.first_dir, len(self.data))
        entries: list[DirEntry] = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 0x40)
            etype = raw[off + 0x42]
            if etype not in (1, 2, 5) or name_len < 2 or name_len > 64:
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            (start,) = struct.unpack_from("<I", raw, off + 0x74)
            (size,) = struct.unpack_from("<Q", raw, off + 0x78)
            if self.major == 3:
                # MS-CFB 2.6.1: version-3 writers are only required to
                # initialize the LOW 32 bits of stream size; garbage in
                # the high word otherwise inflates size past the mini
                # cutoff, so open_stream reads the mini-sid as a FAT
                # sid — silently returning the WRONG stream bytes
                size &= 0xFFFFFFFF
            entries.append(DirEntry(name, etype, start, size))
        return entries

    # -- public API ------------------------------------------------------
    def stream_names(self) -> list[str]:
        return [e.name for e in self.entries if e.type == 2]

    def open_stream(self, name: str) -> bytes:
        for e in self.entries:
            if e.type == 2 and e.name == name:
                if e.size < self.mini_cutoff:
                    return self._read_mini_chain(e.start, e.size)
                return self._read_chain(e.start, e.size)
        raise KeyError(name)

    def has_stream(self, name: str) -> bool:
        return any(e.type == 2 and e.name == name for e in self.entries)
