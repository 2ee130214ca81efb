"""strftime/chrono format → Java DateTimeFormatter pattern translation.

The reference accepts chrono-style (strftime) format strings for
``str.to_date``/``str.to_datetime``/``dt.to_string`` (see /root/reference
native_shim/src/expr.rs:504-564).  Spark uses Java DateTimeFormatter patterns,
so we translate.  Only directives that appear in chrono's strftime table are
handled; unknown directives raise so silent misparses can't slip through.
"""

from __future__ import annotations

__all__ = ["strftime_to_java", "duration_to_interval", "parse_polars_duration_us"]

_MAP = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "e": "d",
    "H": "HH",
    "k": "H",
    "I": "hh",
    "l": "h",
    "M": "mm",
    "S": "ss",
    "f": "SSSSSS",  # chrono %f = fractional seconds (we emit microsecond precision)
    "3f": "SSS",
    "6f": "SSSSSS",
    "9f": "SSSSSSSSS",
    "B": "MMMM",
    "b": "MMM",
    "h": "MMM",
    "A": "EEEE",
    "a": "EEE",
    "j": "DDD",
    "p": "a",
    "P": "a",
    "z": "xx",
    ":z": "xxx",
    "Z": "zz",
    "G": "YYYY",  # ISO week year
    "V": "ww",  # ISO week number
    "u": "e",  # ISO weekday (1-7 Mon-Sun)
    "s": "n/a",  # unix timestamp - not representable; raise below
    "T": "HH:mm:ss",
    "D": "MM/dd/yy",
    "F": "yyyy-MM-dd",
    "R": "HH:mm",
}

_PASSTHROUGH_SAFE = set(" -/:.,_()[]")


def strftime_to_java(fmt: str) -> str:
    out: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch != "%":
            if ch.isalpha():
                # Java patterns treat bare letters as directives -> quote them
                out.append(f"'{ch}'")
            else:
                out.append(ch)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError(f"dangling % in format {fmt!r}")
        nxt = fmt[i + 1]
        if nxt == "%":
            out.append("%")
            i += 2
            continue
        # multi-char directives like %3f, %6f, %9f, %:z
        for width in (2, 1):
            key = fmt[i + 1 : i + 1 + width]
            if key in _MAP:
                java = _MAP[key]
                if java == "n/a":
                    raise ValueError(f"strftime directive %{key} not supported")
                out.append(java)
                i += 1 + width
                break
        else:
            raise ValueError(f"unsupported strftime directive %{nxt} in {fmt!r}")
    return "".join(out)


_DUR_UNIT_US = {
    "ns": 1e-3,
    "us": 1.0,
    "ms": 1_000.0,
    "s": 1_000_000.0,
    "m": 60_000_000.0,
    "h": 3_600_000_000.0,
    "d": 86_400_000_000.0,
    "w": 7 * 86_400_000_000.0,
}


def parse_polars_duration_us(dur: str) -> int:
    """Parse a polars duration string ("1h30m", "15m", "1d") to microseconds.

    Calendar-aware units (mo/q/y) are rejected here; callers that can handle
    them (dynamic group_by via F.window) parse those separately.
    """
    total = 0.0
    num = ""
    i = 0
    while i < len(dur):
        ch = dur[i]
        if ch.isdigit() or ch in "+-.":
            num += ch
            i += 1
            continue
        unit = ch
        if i + 1 < len(dur) and not dur[i + 1].isdigit() and dur[i + 1] not in "+-.":
            unit += dur[i + 1]
        if unit in ("mo", "ns", "us", "ms"):
            i += len(unit)
        else:
            unit = ch
            i += 1
        if unit == "mo" or unit in ("q", "y"):
            raise ValueError(f"calendar unit {unit!r} is not fixed-width; use F.window path")
        if unit not in _DUR_UNIT_US:
            raise ValueError(f"unknown duration unit {unit!r} in {dur!r}")
        if not num:
            raise ValueError(f"missing number before unit in {dur!r}")
        total += float(num) * _DUR_UNIT_US[unit]
        num = ""
    if num:
        raise ValueError(f"trailing number without unit in {dur!r}")
    return int(total)


def duration_to_interval(dur: str) -> str:
    """Polars duration string → Spark SQL interval literal body ("1h30m" → "1 hours 30 minutes")."""
    names = {
        "w": "weeks",
        "d": "days",
        "h": "hours",
        "m": "minutes",
        "s": "seconds",
        "ms": "milliseconds",
        "us": "microseconds",
        "mo": "months",
        "y": "years",
        "q": None,  # expand to months
    }
    parts: list[str] = []
    num = ""
    i = 0
    while i < len(dur):
        ch = dur[i]
        if ch.isdigit() or ch in "+-":
            num += ch
            i += 1
            continue
        unit = ch
        if dur[i : i + 2] in ("mo", "ns", "us", "ms"):
            unit = dur[i : i + 2]
            i += 2
        else:
            i += 1
        if unit == "ns":
            raise ValueError("nanosecond intervals are below Spark timestamp precision")
        if unit == "q":
            parts.append(f"{int(num) * 3} months")
        else:
            parts.append(f"{num} {names[unit]}")
        num = ""
    return " ".join(parts)
