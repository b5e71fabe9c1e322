"""WebSocket protocol layer of the viewer (RFC 6455, stdlib-only)."""

import io

from cellularautomatons3d_tpu.viewer import ws


def test_accept_key_rfc_example():
    # RFC 6455 §1.3 worked example.
    assert (
        ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def test_send_frame_small():
    buf = io.BytesIO()
    ws.send_frame(buf, b"hello", ws.OP_TEXT)
    data = buf.getvalue()
    assert data[0] == 0x81          # FIN + text
    assert data[1] == 5             # unmasked, 7-bit length
    assert data[2:] == b"hello"


def test_send_frame_medium_and_large_lengths():
    buf = io.BytesIO()
    ws.send_frame(buf, b"x" * 300)
    data = buf.getvalue()
    assert data[0] == 0x82 and data[1] == 126
    assert int.from_bytes(data[2:4], "big") == 300

    buf = io.BytesIO()
    ws.send_frame(buf, b"y" * 70000)
    data = buf.getvalue()
    assert data[1] == 127
    assert int.from_bytes(data[2:10], "big") == 70000


def _masked(payload: bytes, opcode=ws.OP_TEXT, mask=b"\x01\x02\x03\x04",
            fin=True):
    body = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    n = len(payload)
    assert n < 126
    return bytes([(0x80 if fin else 0) | opcode, 0x80 | n]) + mask + body


def test_recv_masked_client_frame():
    op, payload = ws.recv_message(io.BytesIO(_masked(b"hello")))
    assert op == ws.OP_TEXT and payload == b"hello"


def test_recv_fragmented_message():
    stream = _masked(b"hel", fin=False) + _masked(b"lo", opcode=ws.OP_CONT)
    op, payload = ws.recv_message(io.BytesIO(stream))
    assert op == ws.OP_TEXT and payload == b"hello"


def test_recv_eof():
    op, payload = ws.recv_message(io.BytesIO(b""))
    assert op is None and payload == b""
