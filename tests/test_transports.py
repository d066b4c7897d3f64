"""FileManager remote matrix: local/SFTP/FTP endpoints behind one
Transport interface (reference models.py:1664-2392 dispatch matrix,
e.g. sftp→sftp 2081-2126). The remote quadrants are exercised through
the in-memory transport double — same code path as paramiko/ftplib
endpoints, which differ only in I/O plumbing."""

import datetime as dt
import gzip

import pytest

from pydin_spark import FileManager
from pydin_spark.sources import Server, registry
from pydin_spark.transports import (LocalTransport, MemoryTransport,
                                    transport_for)


def test_memory_transport_surface():
    m = MemoryTransport()
    m.put("/data/a.txt", b"alpha")
    m.put("/data/sub/b.txt", b"beta")
    flat = [(p, s) for p, _, s in m.walk("/data")]
    assert flat == [("/data/a.txt", 5)]
    deep = sorted(p for p, _, _ in m.walk("/data", recursive=True))
    assert deep == ["/data/a.txt", "/data/sub/b.txt"]
    with m.open_read("/data/a.txt") as f:
        assert f.read() == b"alpha"
    with m.open_write("/data/c.txt") as f:
        f.write(b"gamma")
    assert m.files["/data/c.txt"] == b"gamma"
    m.rename("/data/c.txt", "/data/d.txt")
    assert "/data/c.txt" not in m.files and m.files["/data/d.txt"] == b"gamma"
    m.remove("/data/d.txt")
    assert "/data/d.txt" not in m.files
    with pytest.raises(FileNotFoundError):
        m.open_read("/data/zzz")


def test_local_to_remote_copy(tmp_path):
    (tmp_path / "a.txt").write_bytes(b"payload-a")
    (tmp_path / "skip.log").write_bytes(b"nope")
    remote = MemoryTransport()
    n = FileManager(path=str(tmp_path), mask=r"\.txt$", action="copy",
                    destination="/landing", target_transport=remote).execute()
    assert n == 1
    assert remote.files == {"/landing/a.txt": b"payload-a"}
    # tempname semantics: no .tmp survives
    assert not any(p.endswith(".tmp") for p in remote.files)


def test_remote_to_local_copy(tmp_path):
    remote = MemoryTransport()
    remote.put("/out/report.csv", b"c1;c2\n1;2\n")
    n = FileManager(path="/out", mask=r"\.csv$", action="copy",
                    destination=str(tmp_path), transport=remote).execute()
    assert n == 1
    assert (tmp_path / "report.csv").read_bytes() == b"c1;c2\n1;2\n"


def test_remote_to_remote_move_with_gzip():
    src, dst = MemoryTransport(), MemoryTransport()
    src.put("/src/big.bin", b"x" * 1000)
    n = FileManager(path="/src", mask=r"\.bin$", action="move",
                    destination="/arch", zip=True,
                    transport=src, target_transport=dst).execute()
    assert n == 1
    assert src.files == {}                       # move removed the source
    assert set(dst.files) == {"/arch/big.bin.gz"}
    assert gzip.decompress(dst.files["/arch/big.bin.gz"]) == b"x" * 1000


def test_remote_unzip_roundtrip():
    src, dst = MemoryTransport(), MemoryTransport()
    src.put("/in/data.txt.gz", gzip.compress(b"hello remote"))
    FileManager(path="/in", mask=r"\.gz$", action="copy",
                destination="/plain", unzip=True,
                transport=src, target_transport=dst).execute()
    assert dst.files == {"/plain/data.txt": b"hello remote"}


def test_remote_delete_and_created_window():
    src = MemoryTransport()
    old = dt.datetime(2024, 1, 1, 12, 0)
    new = dt.datetime(2024, 6, 1, 12, 0)
    src.put("/logs/old.log", b"1", mtime=old)
    src.put("/logs/new.log", b"2", mtime=new)
    n = FileManager(path="/logs", mask=r"\.log$", action="delete",
                    created=old, transport=src).execute()
    assert n == 1
    assert set(src.files) == {"/logs/new.log"}


def test_registry_server_endpoints_resolve_to_transports():
    """server_name/target_name resolve Server rows to transports; an
    injected ``transport`` attribute (test double / custom client) wins
    over protocol-based construction."""
    src_double, dst_double = MemoryTransport(), MemoryTransport()
    src_double.put("/drop/f.dat", b"ship-it")
    src_server = Server("up_srv", host="up.example.com", protocol="sftp")
    dst_server = Server("down_srv", host="down.example.com", protocol="ftp")
    src_server.transport = src_double
    dst_server.transport = dst_double
    registry.register(src_server)
    registry.register(dst_server)
    try:
        n = FileManager(server_name="up_srv", path="/drop", mask=r"\.dat$",
                        action="copy", destination="/recv",
                        target_name="down_srv").execute()
        assert n == 1
        assert dst_double.files == {"/recv/f.dat": b"ship-it"}
    finally:
        del registry["up_srv"], registry["down_srv"]


def test_transport_for_protocols():
    assert isinstance(transport_for(None), LocalTransport)
    mem = MemoryTransport()
    assert transport_for(mem) is mem
    carried = Server("x", host="h", protocol="sftp")
    carried.transport = mem
    assert transport_for(carried) is mem
    # sftp without paramiko (absent in this container) fails loudly,
    # not silently local
    try:
        import paramiko  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="paramiko"):
            transport_for(Server("y", host="h", protocol="sftp"))


def test_fan_out_to_multiple_destinations(tmp_path):
    remote = MemoryTransport()
    (tmp_path / "x.txt").write_bytes(b"fan")
    FileManager(path=str(tmp_path), mask=r"\.txt$", action="copy",
                destination=["/a", "/b"],
                target_transport=remote).execute()
    assert set(remote.files) == {"/a/x.txt", "/b/x.txt"}


def test_remote_exec_matrix_local_and_fake_ssh(spark):
    """Command executable (reference conn.execute over ssh.exec_command,
    sources.py:79-81): local host + injected-transport 'remote' matrix,
    exit status and stderr recorded in the query log."""
    from pydin_spark import Command, Pipeline
    from pydin_spark.audit import AuditLog
    from pydin_spark.scheduler import History

    # local quadrant: a real subprocess on the driver host
    audit = AuditLog(History(), run_id=11)
    cmd = Command(text="echo out-$((40+2)); echo err-side 1>&2")
    Pipeline(cmd, spark=spark, audit=audit).run()
    assert cmd.stdout.strip() == "out-42"
    assert cmd.stderr.strip() == "err-side"

    # fake-SSH quadrant: Server with an injected transport double
    remote = MemoryTransport()
    remote.handlers["/opt/app/cleanup.sh --day 2024-01-02"] = (0, "done", "")
    remote.handlers["/opt/app/broken.sh"] = (3, "", "boom")
    registry.register(Server("opsbox", host="fake", protocol="ssh"))
    registry.resolve("opsbox").transport = remote
    try:
        ok = Command(source_name="opsbox",
                     text="/opt/app/cleanup.sh --day 2024-01-02")
        Pipeline(ok, spark=spark, audit=audit).run()
        assert ok.stdout == "done"

        import pytest as _pytest
        bad = Command(source_name="opsbox", text="/opt/app/broken.sh")
        with _pytest.raises(Exception, match="exited 3"):
            Pipeline(bad, spark=spark, audit=audit).run()

        tolerated = Command(source_name="opsbox",
                            text="/opt/app/broken.sh", check=False)
        assert tolerated.execute() == 3     # surfaced, not raised
        assert remote.commands == [
            "/opt/app/cleanup.sh --day 2024-01-02",
            "/opt/app/broken.sh", "/opt/app/broken.sh"]
    finally:
        del registry["opsbox"]

    logged = [r for r in audit.queries()]
    by_text = {}
    for r in logged:
        by_text.setdefault(r["query_text"], []).append(r)
    assert by_text["echo out-$((40+2)); echo err-side 1>&2"][0]["records"] == 0
    ok_rows = by_text["/opt/app/cleanup.sh --day 2024-01-02"]
    assert ok_rows[0]["status"] == "D" and ok_rows[0]["records"] == 0
    bad_rows = by_text["/opt/app/broken.sh"]
    assert all(r["status"] == "E" and r["records"] == 3
               and "boom" in r["error_text"] for r in bad_rows)


def test_base_transport_has_no_exec_channel():
    import pytest as _pytest

    class _Stub(MemoryTransport.__mro__[1]):  # the Transport base
        pass

    with _pytest.raises(NotImplementedError, match="no remote-command"):
        _Stub().execute("ls")
