"""Socket-level bridge integration: mirrors the reference's listener smoke
test (listener/carbon_plaintext_test.go:13-76 — real TCP + UDP on localhost,
good lines + malformed ones) and additionally asserts delivery, which the
reference's test never did. Malformed lines must SURVIVE the bridge: the
listener/parser split means A3 drops them engine-side."""

from __future__ import annotations

import asyncio
import os
import socket
import threading
import time

from cassabon_spark.sources.bridge import serve


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_bridge_tcp_udp_to_file_drop(tmp_path):
    drop = str(tmp_path / "drop")
    tcp_port, udp_port = _free_port(), _free_port()
    stop = None
    loop_holder = {}

    def run():
        async def main():
            loop_holder["loop"] = asyncio.get_running_loop()
            loop_holder["stop"] = asyncio.Event()
            await serve(
                drop, tcp_port=tcp_port, udp_port=udp_port, stop_event=loop_holder["stop"]
            )

        asyncio.run(main())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "stop" in loop_holder:
            break
        time.sleep(0.05)
    time.sleep(0.3)  # listeners binding

    # TCP: lines split across writes (reassembly) + a malformed line
    tc = socket.create_connection(("127.0.0.1", tcp_port))
    tc.sendall(b"tcp.a 1 1000\ntcp.b 2 10")
    time.sleep(0.05)
    tc.sendall(b"01\ncarbon.terrible 9 Qsplork\n")
    tc.close()

    # UDP: datagram boundary splits a line; remainder completes next packet
    us = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    us.sendto(b"udp.x 5 1000\nudp.y 6 10", ("127.0.0.1", udp_port))
    us.sendto(b"02\n", ("127.0.0.1", udp_port))
    us.close()

    # age-based roll fires at ~2s; then stop the bridge
    deadline = time.time() + 10
    lines: set[str] = set()
    while time.time() < deadline:
        lines = set()
        for f in os.listdir(drop) if os.path.isdir(drop) else []:
            if not f.startswith("."):
                with open(os.path.join(drop, f)) as fh:
                    lines.update(ln.strip() for ln in fh if ln.strip())
        if len(lines) >= 5:
            break
        time.sleep(0.25)

    loop_holder["loop"].call_soon_threadsafe(loop_holder["stop"].set)
    t.join(timeout=10)

    assert lines == {
        "tcp.a 1 1000",
        "tcp.b 2 1001",  # reassembled across TCP reads
        "carbon.terrible 9 Qsplork",  # malformed: bridge passes, A3 drops
        "udp.x 5 1000",
        "udp.y 6 1002",  # reassembled across datagrams
    }
