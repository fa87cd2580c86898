"""Carbon wire-protocol ingest bridge: TCP/UDP listeners -> file drops.

Spark has no UDP source and its socket source is dev-only (SURVEY A1/A2), so
the production ingest shape is: a tiny asyncio bridge accepts Carbon
plaintext traffic and rolls it into text files in a drop directory that the
Structured Streaming query (streaming.ingest) watches. Kafka would replace
the file drop 1:1 in a real deployment.

Reference behaviors preserved:
  * TCP: newline-framed lines per connection
    (listener/carbon_plaintext.go:68-122)
  * UDP: datagrams may split lines across packet boundaries; only complete
    lines are dispatched, the trailing remainder is carried into the next
    packet (listener/carbon_plaintext.go:148-183) — see LineReassembler
  * no parsing here: malformed lines travel to the engine and are dropped
    and counted there (A3), exactly like the reference's listener/parser
    split
"""

from __future__ import annotations

import asyncio
import os
import time


class LineReassembler:
    """Carry-forward reassembly of lines split across datagram boundaries
    (listener/carbon_plaintext.go:148-183): dispatch only up to the last
    newline, keep the remainder for the next chunk."""

    def __init__(self):
        self._remainder = ""

    def feed(self, chunk: str) -> list[str]:
        data = self._remainder + chunk
        if "\n" not in data:
            self._remainder = data
            return []
        complete, self._remainder = data.rsplit("\n", 1)
        return [ln for ln in complete.split("\n") if ln.strip()]

    def flush(self) -> list[str]:
        rem, self._remainder = self._remainder, ""
        return [rem] if rem.strip() else []


class FileRoller:
    """Append lines to a rolling file in the drop directory; rotate by line
    count or age so the streaming source sees closed files promptly."""

    def __init__(self, drop_dir: str, max_lines: int = 10000, max_age_s: float = 2.0):
        self.drop_dir = drop_dir
        self.max_lines = max_lines
        self.max_age_s = max_age_s
        self._buf: list[str] = []
        self._opened = time.monotonic()
        self._seq = 0
        os.makedirs(drop_dir, exist_ok=True)

    def add(self, lines: list[str]) -> None:
        self._buf.extend(lines)
        if len(self._buf) >= self.max_lines or (
            self._buf and time.monotonic() - self._opened > self.max_age_s
        ):
            self.roll()

    def roll(self) -> str | None:
        if not self._buf:
            return None
        # write to a dotfile then rename: the file source must never see a
        # half-written file
        name = f"carbon-{os.getpid()}-{self._seq:08d}.txt"
        tmp = os.path.join(self.drop_dir, "." + name)
        final = os.path.join(self.drop_dir, name)
        with open(tmp, "w") as f:
            f.write("\n".join(self._buf) + "\n")
        os.rename(tmp, final)
        self._buf = []
        self._seq += 1
        self._opened = time.monotonic()
        return final


async def serve(
    drop_dir: str,
    host: str = "127.0.0.1",
    tcp_port: int = 2003,
    udp_port: int = 2003,
    stop_event: asyncio.Event | None = None,
):
    """Run TCP + UDP listeners until stop_event is set."""
    roller = FileRoller(drop_dir)
    stop_event = stop_event or asyncio.Event()

    async def handle_tcp(reader, writer):
        ra = LineReassembler()
        try:
            while not reader.at_eof():
                chunk = await reader.read(65536)
                if not chunk:
                    break
                roller.add(ra.feed(chunk.decode("utf-8", errors="replace")))
            roller.add(ra.flush())
        finally:
            writer.close()

    class UdpProto(asyncio.DatagramProtocol):
        def __init__(self):
            self.ra = LineReassembler()

        def datagram_received(self, data, addr):
            roller.add(self.ra.feed(data.decode("utf-8", errors="replace")))

    server = await asyncio.start_server(handle_tcp, host, tcp_port)
    loop = asyncio.get_running_loop()
    transport, _ = await loop.create_datagram_endpoint(
        UdpProto, local_addr=(host, udp_port)
    )
    try:
        while not stop_event.is_set():
            await asyncio.sleep(0.5)
            roller.add([])  # age-based roll
            if roller._buf and time.monotonic() - roller._opened > roller.max_age_s:
                roller.roll()
    finally:
        roller.roll()
        server.close()
        transport.close()
        await server.wait_closed()
