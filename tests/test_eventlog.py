"""Unit tests for scripts/eventlog_metrics.py codec sniffing.

Code-review regression: the codec must be sniffed from the part file's
BASENAME (a dotted parent dir must not route an uncompressed part
through a codec) and a live v1 '<app>.zstd.inprogress' log must still
decode through zstd rather than being read as plain UTF-8.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from eventlog_metrics import _open_text  # noqa: E402


def _zstd_bytes(payload: bytes) -> bytes:
    import pyarrow as pa

    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as z:
        z.write(payload)
    return sink.getvalue().to_pybytes()


def test_plain_part_under_dotted_dir(tmp_path):
    d = tmp_path / "elog.zstd"
    d.mkdir()
    p = d / "events_1_app-123"
    p.write_text('{"Event":"x"}\n', encoding="utf-8")
    with _open_text(str(p)) as f:
        assert f.read() == '{"Event":"x"}\n'


def test_compressed_inprogress_log(tmp_path):
    p = tmp_path / "app-123.zstd.inprogress"
    p.write_bytes(_zstd_bytes(b'{"Event":"y"}\n'))
    with _open_text(str(p)) as f:
        assert f.read() == '{"Event":"y"}\n'


def test_compressed_part(tmp_path):
    p = tmp_path / "app-456.zstd"
    p.write_bytes(_zstd_bytes(b'{"Event":"z"}\n'))
    with _open_text(str(p)) as f:
        assert f.read() == '{"Event":"z"}\n'
