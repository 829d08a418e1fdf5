"""The xplane wire-format parser (scripts/xplane_summary.py) against a
hand-encoded XSpace proto.

The parser replaces tensorboard_plugin_profile's converter (ABI-broken in
this environment) for reading ``jax.profiler.trace`` output; this test pins
the wire-format decoding (varints, length-delimited submessages, maps) and
the per-category aggregation without needing protobuf at all.
"""

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from xplane_summary import parse_xspace, parse_event, summarize  # noqa: E402

pytestmark = pytest.mark.smoke


# ---------------------------------------------------------------- wire encode
def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _field(num: int, wt: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wt) + payload


def _msg(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _str(num: int, s: str) -> bytes:
    return _msg(num, s.encode())


def _vint(num: int, v: int) -> bytes:
    return _field(num, 0, _varint(v))


def _stat(metadata_id: int, value) -> bytes:
    body = _vint(1, metadata_id)
    if isinstance(value, float):
        body += _field(2, 1, struct.pack("<d", value))
    elif isinstance(value, str):
        body += _str(5, value)
    else:
        body += _vint(3, value)  # uint64
    return body


def _build_xspace() -> bytes:
    # stat metadata: 1 = hlo_category, 2 = model_flops, 3 = raw_bytes_accessed
    stat_meta = b"".join(
        _msg(5, _vint(1, sid) + _msg(2, _vint(2, sid) + _str(2, name))[
            len(_varint((2 << 3) | 2)) + 1:])  # placeholder, rebuilt below
        for sid, name in ()
    )
    # build stat_metadata map entries properly: map<int64, XStatMetadata>
    def stat_meta_entry(sid, name):
        meta = _vint(1, sid) + _str(2, name)
        return _msg(5, _vint(1, sid) + _msg(2, meta))

    stat_meta = (stat_meta_entry(1, "hlo_category")
                 + stat_meta_entry(2, "model_flops")
                 + stat_meta_entry(3, "raw_bytes_accessed"))

    # event metadata: id 10 = fusion.1 with hlo_category stat attached
    em_body = (_vint(1, 10) + _str(2, "fusion.1")
               + _msg(5, _stat(1, "loop fusion")))
    ev_meta = _msg(4, _vint(1, 10) + _msg(2, em_body))
    em2 = _vint(1, 11) + _str(2, "dot.1") + _msg(5, _stat(1, "convolution"))
    ev_meta += _msg(4, _vint(1, 11) + _msg(2, em2))
    em3 = _vint(1, 12) + _str(2, "jit_step")
    ev_meta += _msg(4, _vint(1, 12) + _msg(2, em3))

    # events: durations in picoseconds
    def event(mid, dur_ps, stats=b""):
        return _msg(4, _vint(1, mid) + _vint(3, dur_ps) + stats)

    ops_line = _msg(3, _str(2, "XLA Ops")
                    + event(10, 2_000_000_000, _msg(4, _stat(2, 500)))
                    + event(10, 1_000_000_000)
                    + event(11, 7_000_000_000,
                            _msg(4, _stat(2, 1000)) + _msg(4, _stat(3, 64))))
    mod_line = _msg(3, _str(2, "XLA Modules") + event(12, 11_000_000_000))
    plane = _msg(1, _str(2, "/device:TPU:0") + ops_line + mod_line
                 + ev_meta + stat_meta)
    return plane


def test_parse_and_aggregate(tmp_path):
    raw = _build_xspace()
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(raw)

    planes = parse_xspace(str(d / "host.xplane.pb"))
    assert len(planes) == 1
    pl = planes[0]
    assert pl["name"] == "/device:TPU:0"
    assert pl["stat_metadata"][1] == "hlo_category"
    assert pl["event_metadata"][10]["name"] == "fusion.1"

    lines = dict((n, evs) for n, evs in pl["lines"])
    assert set(lines) == {"XLA Ops", "XLA Modules"}
    mid, dur, stats = parse_event(lines["XLA Ops"][2])
    assert (mid, dur) == (11, 7_000_000_000)
    assert dict(stats) == {2: 1000, 3: 64}

    out = summarize(str(tmp_path), top=5, steps=1)
    got = out["/device:TPU:0"]
    # 1 module execution of 11 ms; ops: 3 ms loop fusion + 7 ms convolution
    assert got["module_ms_per_step"] == pytest.approx(11.0)
    assert got["op_ms_per_step"] == pytest.approx(10.0)
    assert got["by_category_ms"]["loop fusion"] == pytest.approx(3.0)
    assert got["by_category_ms"]["convolution"] == pytest.approx(7.0)


def test_varint_roundtrip():
    from xplane_summary import _read_varint
    for v in (0, 1, 127, 128, 300, 2 ** 32, 2 ** 63 - 1):
        buf = memoryview(_varint(v))
        got, i = _read_varint(buf, 0)
        assert got == v and i == len(buf)
