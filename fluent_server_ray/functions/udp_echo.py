"""UDP heartbeat echo — the reference's health-check subprotocol.

The reference listens on the same port over UDP and echoes every
datagram (≤1024 bytes) back to its sender verbatim (reference
``server/server.go:60-86``; pinned by ``server/server_test.go:59-84``,
which sends one byte and asserts the identical byte returns). The
reference's own README calls the subprotocol incomplete; it is not
data-plane, so the engine ships it as a standalone stdlib utility the
ops surface can point load balancers at — no Ray involvement.

``python -m fluent_server_ray udp-echo --port N`` serves it.
"""

from __future__ import annotations

import socket
import threading

MAX_DATAGRAM = 1024  # reference reads at most 1024 bytes per datagram


def serve_udp_echo(port: int = 0, host: str = "127.0.0.1"):
    """Bind a UDP echo socket; returns (socket, stop_fn, thread).

    The loop echoes each datagram back to its sender, exactly like the
    reference's goroutine. ``stop_fn()`` closes the socket and joins
    the thread. The bound port is ``sock.getsockname()[1]``.
    """
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    stopping = threading.Event()

    def loop() -> None:
        while not stopping.is_set():
            try:
                data, addr = sock.recvfrom(MAX_DATAGRAM)
            except OSError:  # socket closed by stop()
                return
            try:
                sock.sendto(data, addr)
            except OSError:
                return

    t = threading.Thread(target=loop, daemon=True)
    t.start()

    def stop() -> None:
        stopping.set()
        sock.close()
        t.join(timeout=5)

    return sock, stop, t
