"""Minimal FITS binary-table reader/writer in pure numpy.

The reference reads SDSS speclite coadds and quasar catalogs with
MATLAB ``fitsread(..., 'binarytable')`` (read_spec.m:11-14,
build_catalogs.m:6-18).  astropy is not a dependency of this framework;
BINTABLE parsing is ~150 lines of numpy (FITS 4.0 standard: 2880-byte
blocks, 80-char header cards, big-endian fixed-width records), and a
native C++ fast path for bulk spectrum loading lives in io/native.py.

Supported TFORM codes: L (logical), B (uint8), I (int16), J (int32),
K (int64), E (float32), D (float64), A (character).  Repeat counts
produce (nrows, repeat) arrays; 'A' columns produce fixed-width byte
strings.  This covers every column the pipeline touches.

The writer emits a valid primary HDU + one BINTABLE extension and
exists mainly so tests and the synthetic-data tools can fabricate
spectra/catalogs without astropy.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["read_bintable", "write_bintable", "BinTable"]

BLOCK = 2880

_TFORM_DTYPES = {
    "L": ("u1", 1),
    "B": ("u1", 1),
    "I": (">i2", 2),
    "J": (">i4", 4),
    "K": (">i8", 8),
    "E": (">f4", 4),
    "D": (">f8", 8),
}


class BinTable:
    """A parsed binary table: ordered column names and arrays."""

    def __init__(self, names: list[str], columns: list[np.ndarray]):
        self.names = names
        self.columns = columns

    def __getitem__(self, key):
        """Column by 0-based index or by name (case-insensitive)."""
        if isinstance(key, int):
            return self.columns[key]
        idx = [n.upper() for n in self.names].index(str(key).upper())
        return self.columns[idx]

    def __len__(self):
        return len(self.columns)


def _read_header(buf: memoryview, offset: int) -> tuple[dict, int]:
    """Parse one header (sequence of 2880-byte blocks); returns
    (cards, offset_after_header)."""
    cards: dict[str, str] = {}
    while True:
        block = bytes(buf[offset : offset + BLOCK])
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        offset += BLOCK
        done = False
        for i in range(0, BLOCK, 80):
            card = block[i : i + 80].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if not key or card[8] != "=":
                continue
            value = card[10:]
            if "/" in value:
                # strip the comment; the quoted-string branch applies
                # only when the VALUE itself is a string (an apostrophe
                # inside a numeric card's comment must not suppress it)
                stripped = value.lstrip()
                if stripped.startswith("'"):
                    # find the CLOSING quote, skipping FITS-escaped ''
                    # pairs (an apostrophe inside the value)
                    q = value.find("'")
                    q2 = q
                    while True:
                        q2 = value.find("'", q2 + 1)
                        if q2 == -1 or value[q2 + 1 : q2 + 2] != "'":
                            break
                        q2 += 1
                    value = value[: q2 + 1] if q2 != -1 else value
                else:
                    value = value.split("/")[0]
            cards[key] = value.strip()
        if done:
            break
    return cards, offset


def _card_int(cards: dict, key: str, default=None) -> int:
    if key not in cards:
        if default is None:
            raise KeyError(key)
        return default
    return int(cards[key])


def _card_str(cards: dict, key: str) -> str:
    v = cards.get(key, "").strip()
    if v.startswith("'") and v.endswith("'") and len(v) >= 2:
        # quoted string: strip the delimiters, unescape FITS '' pairs,
        # and drop only TRAILING blanks (significant per the standard)
        return v[1:-1].replace("''", "'").rstrip()
    return v.strip("' ").strip()


def _data_size(cards: dict) -> int:
    """FITS 4.0 data size: |BITPIX|/8 * GCOUNT * (PCOUNT + prod(NAXIS)).

    For the random-groups convention (NAXIS1 == 0) the axis product
    excludes NAXIS1 — the previous form multiplied GCOUNT into the zero
    product and mis-sized such HDUs, shifting every later extension.
    """
    bitpix = abs(_card_int(cards, "BITPIX", 8))
    naxis = _card_int(cards, "NAXIS", 0)
    if naxis == 0:
        return 0
    dims = [_card_int(cards, f"NAXIS{i}") for i in range(1, naxis + 1)]
    if dims[0] == 0:  # random groups
        dims = dims[1:]
    prod = 1
    for d in dims:
        prod *= d
    gcount = _card_int(cards, "GCOUNT", 1)
    pcount = _card_int(cards, "PCOUNT", 0)
    return (bitpix // 8) * gcount * (pcount + prod)


def read_bintable(path: str | Path, hdu: int = 1) -> BinTable:
    """Read the hdu-th extension (1 = first extension) as a BinTable."""
    data = Path(path).read_bytes()
    buf = memoryview(data)

    offset = 0
    cards, offset = _read_header(buf, 0)  # primary
    size = _data_size(cards)
    offset += -(-size // BLOCK) * BLOCK

    for _ in range(hdu):
        cards, data_start = _read_header(buf, offset)
        size = _data_size(cards)
        offset = data_start + (-(-size // BLOCK) * BLOCK)
    if _card_str(cards, "XTENSION") != "BINTABLE":
        raise ValueError(f"HDU {hdu} is not a BINTABLE")

    row_bytes = _card_int(cards, "NAXIS1")
    nrows = _card_int(cards, "NAXIS2")
    tfields = _card_int(cards, "TFIELDS")
    if row_bytes < 0 or nrows < 0 or tfields < 0:
        raise ValueError(
            f"malformed BINTABLE header: NAXIS1={row_bytes}, "
            f"NAXIS2={nrows}, TFIELDS={tfields}"
        )

    names, dtypes, repeats = [], [], []
    for i in range(1, tfields + 1):
        tform = _card_str(cards, f"TFORM{i}")
        names.append(_card_str(cards, f"TTYPE{i}") or f"col{i}")
        j = 0
        while j < len(tform) and tform[j].isdigit():
            j += 1
        repeat = int(tform[:j]) if j else 1
        code = tform[j]
        repeats.append(repeat)
        dtypes.append(code)

    fields = []
    for name, code, repeat in zip(names, dtypes, repeats):
        if code == "A":
            fields.append((name, f"S{repeat}"))
        else:
            dt, _ = _TFORM_DTYPES[code]
            fields.append((name, dt, (repeat,)) if repeat > 1 else (name, dt))
    rec_dtype = np.dtype(fields)
    if rec_dtype.itemsize != row_bytes:
        raise ValueError(
            f"row size mismatch: TFORMs give {rec_dtype.itemsize}, "
            f"NAXIS1={row_bytes}"
        )

    # an explicit size check: np.frombuffer on a short (truncated) file
    # would silently return FEWER rows than NAXIS2 claims whenever the
    # cut lands on a row boundary — corrupt data must raise, not shrink
    nbytes = nrows * row_bytes
    if len(buf) - data_start < nbytes:
        raise ValueError(
            f"truncated FITS data: header claims {nbytes} bytes, "
            f"{len(buf) - data_start} present"
        )
    table = np.frombuffer(buf[data_start : data_start + nbytes], dtype=rec_dtype)
    columns = []
    for name, code in zip(names, dtypes):
        col = table[name]
        if code == "L":
            col = col == ord("T")
        elif code == "A":
            # trailing blanks are not significant in FITS strings
            col = np.char.rstrip(col)
        else:
            col = col.astype(col.dtype.newbyteorder("="))
        columns.append(np.ascontiguousarray(col))
    return BinTable(names, columns)


def _header_block(cards: list[str]) -> bytes:
    out = "".join(c.ljust(80) for c in cards + ["END"])
    pad = -(-len(out) // BLOCK) * BLOCK - len(out)
    return (out + " " * pad).encode("ascii")


def _card(key: str, value, comment: str = "") -> str:
    if isinstance(value, bool):
        head = f"{key:<8}= {'T' if value else 'F':>20}"
    elif isinstance(value, str):
        quoted = value.replace("'", "''")  # FITS apostrophe escaping
        head = f"{key:<8}= '{quoted}'".ljust(30)
    else:
        head = f"{key:<8}= {value:>20}"
    if len(head) > 80:
        # a silently-overflowing card would shift the whole 80-char
        # card grid and corrupt every later card — fail loudly instead
        raise ValueError(
            f"header card value for {key!r} exceeds the 80-character "
            f"FITS card limit ({len(head)} chars)"
        )
    # comments are not significant: truncate rather than overflow
    return (f"{head} / {comment}")[:80]


def write_bintable(
    path: str | Path, names: list[str], columns: list[np.ndarray]
) -> None:
    """Write a primary HDU + one BINTABLE extension."""
    nrows = len(columns[0])
    fields, tforms = [], []
    conv_cols = []
    for name, col in zip(names, columns):
        col = np.asarray(col)
        if col.dtype.kind == "b":
            # FITS logical column: 'T'/'F' bytes with TFORM 'L' (the
            # reader's dedicated branch), so bool round-trips as bool
            col = np.where(col, np.uint8(ord("T")), np.uint8(ord("F")))
            fields.append((name, "u1"))
            tforms.append("L")
        elif col.dtype.kind in "SU":
            width = int(col.dtype.itemsize if col.dtype.kind == "S" else col.dtype.itemsize // 4)
            col = np.char.ljust(col.astype(f"S{width}"), width)
            fields.append((name, f"S{width}"))
            tforms.append(f"{width}A")
        else:
            kind_map = {"f8": ("D", ">f8"), "f4": ("E", ">f4"),
                        "i8": ("K", ">i8"), "i4": ("J", ">i4"),
                        "i2": ("I", ">i2"), "u1": ("B", "u1")}
            key = col.dtype.str.lstrip("<>|=")
            code, dt = kind_map[key]
            repeat = 1 if col.ndim == 1 else col.shape[1]
            fields.append((name, dt, (repeat,)) if repeat > 1 else (name, dt))
            tforms.append(f"{repeat}{code}" if repeat > 1 else code)
        conv_cols.append(col)

    rec_dtype = np.dtype(fields)
    rec = np.zeros(nrows, rec_dtype)
    for name, col in zip(names, conv_cols):
        rec[name] = col

    primary = _header_block(
        [_card("SIMPLE", True), _card("BITPIX", 8), _card("NAXIS", 0),
         _card("EXTEND", True)]
    )
    ext_cards = [
        _card("XTENSION", "BINTABLE"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", rec_dtype.itemsize),
        _card("NAXIS2", nrows),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(names)),
    ]
    for i, (name, tform) in enumerate(zip(names, tforms), start=1):
        ext_cards.append(_card(f"TTYPE{i}", name))
        ext_cards.append(_card(f"TFORM{i}", tform))
    ext = _header_block(ext_cards)

    payload = rec.tobytes()
    pad = -(-len(payload) // BLOCK) * BLOCK - len(payload)
    Path(path).write_bytes(primary + ext + payload + b"\0" * pad)
