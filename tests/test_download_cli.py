"""vilmedic-download CLI: catalog, local --source installs, and the direct-URL
zip flow exercised against a loopback HTTP server (no egress needed)."""

import importlib.util
import os
import sys
import threading
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cli(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "vilmedic_download", os.path.join(REPO, "bin_tpu", "vilmedic_download.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "DATA_ZOO_CACHE_DIR", str(tmp_path / "data"))
    monkeypatch.setattr(mod, "MODEL_ZOO_CACHE_DIR", str(tmp_path / "models"))
    return mod


def _make_zip(tmp_path):
    z = tmp_path / "artifact.zip"
    with zipfile.ZipFile(z, "w") as f:
        f.writestr("train.report.tok", "no acute disease .\n")
        f.writestr("sub/extra.txt", "x")
    return z


def test_list_catalog(cli, capsys):
    cli.main(["--list"])
    out = capsys.readouterr().out
    assert "RRG/mimic-cxr" in out and "Models:" in out


def test_install_from_source_zip_and_dir(cli, tmp_path, capsys):
    z = _make_zip(tmp_path)
    cli.main(["RRG/mimic-cxr", "--source", str(z)])
    installed = os.path.join(cli.DATA_ZOO_CACHE_DIR, "RRG/mimic-cxr")
    assert open(os.path.join(installed, "train.report.tok")).read().startswith("no acute")

    # second install: already cached short-circuit
    cli.main(["RRG/mimic-cxr", "--source", str(z)])
    assert "already cached" in capsys.readouterr().out

    src_dir = tmp_path / "plaindir"
    src_dir.mkdir()
    (src_dir / "a.tok").write_text("hello")
    cli.main(["RRG/indiana", "--source", str(src_dir)])
    assert (
        open(os.path.join(cli.DATA_ZOO_CACHE_DIR, "RRG/indiana", "a.tok")).read()
        == "hello"
    )


def test_download_url_over_loopback_http(cli, tmp_path, capsys):
    """The network branch itself (stream + extract + install), served from a
    loopback HTTP server — the reference's gdown zip flow (zoo/utils.py:30-76)
    without egress."""
    import http.server
    import socketserver

    _make_zip(tmp_path)

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(tmp_path), **k)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), Handler) as httpd:
        port = httpd.server_address[1]
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        try:
            cli.main(["RRS/mimic-cxr",
                      "--url", f"http://127.0.0.1:{port}/artifact.zip"])
        finally:
            httpd.shutdown()
    installed = os.path.join(cli.DATA_ZOO_CACHE_DIR, "RRS/mimic-cxr")
    assert os.path.exists(os.path.join(installed, "sub/extra.txt"))
    assert "installed RRS/mimic-cxr" in capsys.readouterr().out


def test_download_url_failure_is_actionable(cli):
    with pytest.raises(SystemExit) as e:
        cli.main(["RRG/padchest", "--url", "http://127.0.0.1:1/nope.zip"])
    assert "download failed" in str(e.value)


def test_download_url_rejects_non_zip(cli, tmp_path):
    """A mirror answering 200 with an HTML/text page must fail with a clear
    message (not a confusing --source/temp-path error)."""
    import http.server
    import socketserver

    (tmp_path / "artifact.zip").write_text("<html>404-ish</html>")

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(tmp_path), **k)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), Handler) as httpd:
        port = httpd.server_address[1]
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        try:
            with pytest.raises(SystemExit) as e:
                cli.main(["MVQA/imageclef",
                          "--url", f"http://127.0.0.1:{port}/artifact.zip"])
        finally:
            httpd.shutdown()
    assert "did not return a .zip" in str(e.value)
