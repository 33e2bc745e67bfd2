"""Minimization server + client round-trip (tools/server.py + server_client).

Reference: gninasrc/gninaserver (boost::asio TCP service) and its
client.py; ours is an HTTP/JSON redesign, so the test drives the real
network path: server thread -> client submit -> JSON results.
"""

import threading

import pytest

from gnina_tpu.docking import DockSettings

DATA = "/root/reference/test/gnina/data"

pytestmark = pytest.mark.slow  # one minimize program compile


@pytest.mark.smoke
def test_server_roundtrip():
    from http.server import ThreadingHTTPServer

    from gnina_tpu.tools import server as srv
    from gnina_tpu.tools import server_client as cli

    state = srv._State(DockSettings(cnn_scoring="none", minimize_iters=5))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv._make_handler(state))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        st = cli.status("127.0.0.1", port)
        assert st["receptor_loaded"] is False

        results = cli.submit("127.0.0.1", port, f"{DATA}/noelem_rec.pdb",
                             f"{DATA}/noelem.sdf")
        assert len(results) == 1
        r = results[0]
        assert r["minimizedAffinity"] < 0.0
        assert r["rmsd"] >= 0.0

        st = cli.status("127.0.0.1", port)
        assert st["receptor_loaded"] is True
        assert st["ligands_minimized"] == 1
    finally:
        httpd.shutdown()
