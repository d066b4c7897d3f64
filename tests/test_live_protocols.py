"""Real-wire-protocol endpoint tests (VERDICT r9 #4).

The FileManager remote matrix in test_transports.py runs against
scripted doubles; these tests drive the ACTUAL protocol clients over
real sockets:

- FTP: a minimal in-process FTP server built on stdlib sockets (the
  client, ftplib, is stdlib too — so this runs in every container).
  It speaks the verbs FTPTransport uses: USER/PASS, TYPE, PASV, MLSD,
  RETR, STOR, DELE, RNFR/RNTO, MKD, QUIT.
- SFTP: an in-process paramiko ServerInterface + SFTPServerInterface
  (reference parity: the reference drives real paramiko servers,
  sources.py:79-142). paramiko is not installed in this container, so
  the whole class importorskips and SELF-ACTIVATES when paramiko is
  present — the same env-gated pattern as the real-PIL codec test.
"""

import datetime as dt
import os
import socket
import threading

import pytest

from pydin_spark import FileManager
from pydin_spark.sources import Server, registry
from pydin_spark.transports import FTPTransport, transport_for


# ---------------------------------------------------------------------
# minimal stdlib FTP server
# ---------------------------------------------------------------------


class MiniFTPServer(threading.Thread):
    """Just enough RFC 959 + MLSD to serve ftplib from a local dir."""

    def __init__(self, root: str, user="u", password="pw"):
        super().__init__(daemon=True)
        self.root, self.user, self.password = root, user, password
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(5)
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()

    def stop(self):
        self._stop.set()
        try:
            socket.create_connection(("127.0.0.1", self.port),
                                     timeout=1).close()
        except OSError:
            pass

    def _real(self, path: str) -> str:
        p = os.path.normpath(os.path.join(
            self.root, path.replace("\\", "/").lstrip("/")))
        if not p.startswith(os.path.normpath(self.root)):
            raise PermissionError(path)
        return p

    def run(self):
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                break
            if self._stop.is_set():
                conn.close()
                break
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()
        self.sock.close()

    # -- one control connection ----------------------------------------

    def _serve(self, conn: socket.socket):
        f = conn.makefile("rwb")

        def send(line: str):
            f.write((line + "\r\n").encode())
            f.flush()

        def open_data():
            d, _ = data_listener.accept()
            return d

        send("220 mini-ftp ready")
        rnfr = None
        data_listener = None
        while True:
            raw = f.readline()
            if not raw:
                break
            line = raw.decode().rstrip("\r\n")
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            try:
                if cmd == "USER":
                    send("331 password required"
                         if arg == self.user else "331 ok")
                elif cmd == "PASS":
                    if arg == self.password:
                        send("230 logged in")
                    else:
                        send("530 bad credentials")
                elif cmd == "TYPE":
                    send("200 type set")
                elif cmd == "PASV":
                    if data_listener is not None:
                        data_listener.close()
                    data_listener = socket.socket()
                    data_listener.bind(("127.0.0.1", 0))
                    data_listener.listen(1)
                    p = data_listener.getsockname()[1]
                    send(f"227 Entering Passive Mode "
                         f"(127,0,0,1,{p >> 8},{p & 255})")
                elif cmd == "MLSD":
                    d = open_data()
                    send("150 listing")
                    real = self._real(arg or "/")
                    for name in sorted(os.listdir(real)):
                        st = os.stat(os.path.join(real, name))
                        kind = ("dir" if os.path.isdir(
                            os.path.join(real, name)) else "file")
                        mod = dt.datetime.fromtimestamp(
                            st.st_mtime).strftime("%Y%m%d%H%M%S")
                        d.sendall(
                            f"type={kind};size={st.st_size};"
                            f"modify={mod}; {name}\r\n".encode())
                    d.close()
                    send("226 done")
                elif cmd == "RETR":
                    d = open_data()
                    send("150 sending")
                    with open(self._real(arg), "rb") as src:
                        d.sendall(src.read())
                    d.close()
                    send("226 done")
                elif cmd == "STOR":
                    d = open_data()
                    send("150 receiving")
                    chunks = []
                    while True:
                        b = d.recv(1 << 16)
                        if not b:
                            break
                        chunks.append(b)
                    d.close()
                    with open(self._real(arg), "wb") as dst:
                        dst.write(b"".join(chunks))
                    send("226 done")
                elif cmd == "DELE":
                    os.remove(self._real(arg))
                    send("250 deleted")
                elif cmd == "RNFR":
                    rnfr = self._real(arg)
                    send("350 ready")
                elif cmd == "RNTO":
                    os.replace(rnfr, self._real(arg))
                    rnfr = None
                    send("250 renamed")
                elif cmd == "MKD":
                    os.makedirs(self._real(arg), exist_ok=True)
                    send(f'257 "{arg}" created')
                elif cmd == "QUIT":
                    send("221 bye")
                    break
                else:
                    send(f"502 {cmd} not implemented")
            except FileNotFoundError:
                send("550 not found")
            except PermissionError:
                send("550 permission denied")
            except OSError as exc:
                send(f"451 {type(exc).__name__}")
        f.close()
        conn.close()
        if data_listener is not None:
            data_listener.close()


@pytest.fixture()
def ftp_server(tmp_path):
    root = tmp_path / "ftp_root"
    root.mkdir()
    srv = MiniFTPServer(str(root))
    srv.start()
    yield srv, root
    srv.stop()


def _ftp_source(srv):
    return Server("livebox", host="127.0.0.1", port=srv.port,
                  protocol="ftp", user=srv.user, password=srv.password)


def test_ftp_transport_full_matrix_over_real_sockets(ftp_server):
    """Every verb FTPTransport implements, against a genuine FTP
    conversation (control + passive data channels)."""
    srv, root = ftp_server
    (root / "a.txt").write_bytes(b"hello wire")
    (root / "sub").mkdir()
    (root / "sub" / "b.txt").write_bytes(b"nested")
    t = transport_for(_ftp_source(srv))
    assert isinstance(t, FTPTransport)
    # walk: flat then recursive (type=dir facts honored)
    flat = {os.path.basename(p) for p, _, _ in t.walk("/")}
    assert flat == {"a.txt"}
    deep = {os.path.basename(p) for p, _, _ in t.walk("/", True)}
    assert deep == {"a.txt", "b.txt"}
    sizes = {os.path.basename(p): s for p, _, s in t.walk("/", True)}
    assert sizes["a.txt"] == 10
    # read (RETR)
    with t.open_read("/a.txt") as fh:
        assert fh.read() == b"hello wire"
    # write (STOR via the spooled close hook)
    w = t.open_write("/c.bin")
    w.write(b"\x00\x01binary\xff")
    w.close()
    assert (root / "c.bin").read_bytes() == b"\x00\x01binary\xff"
    # rename (RNFR/RNTO) and delete (DELE)
    t.rename("/c.bin", "/d.bin")
    assert not (root / "c.bin").exists()
    assert (root / "d.bin").read_bytes() == b"\x00\x01binary\xff"
    t.remove("/d.bin")
    assert not (root / "d.bin").exists()
    # makedirs (MKD, idempotent)
    t.makedirs("/x/y")
    t.makedirs("/x/y")
    assert (root / "x" / "y").is_dir()
    t.close()


def test_filemanager_copies_from_live_ftp(ftp_server, tmp_path):
    """Full stack: registry Server -> transport_for -> ftplib ->
    real sockets, driven by the FileManager operator."""
    srv, root = ftp_server
    (root / "drop").mkdir()
    (root / "drop" / "one.dat").write_bytes(b"1" * 64)
    (root / "drop" / "two.dat").write_bytes(b"2" * 64)
    (root / "drop" / "skip.txt").write_bytes(b"no")
    local = tmp_path / "landing"
    local.mkdir()
    registry.register(_ftp_source(srv))
    try:
        n = FileManager(server_name="livebox", path="/drop",
                        mask=r"\.dat$", action="copy",
                        destination=str(local)).execute()
    finally:
        del registry["livebox"]
    assert n == 2
    assert sorted(p.name for p in local.iterdir()) == ["one.dat",
                                                       "two.dat"]
    assert (local / "one.dat").read_bytes() == b"1" * 64


def test_filemanager_uploads_to_live_ftp(ftp_server, tmp_path):
    srv, root = ftp_server
    (root / "inbox").mkdir()
    src = tmp_path / "outgoing"
    src.mkdir()
    (src / "r1.csv").write_text("a;b\n1;2\n")
    registry.register(_ftp_source(srv))
    try:
        n = FileManager(path=str(src), mask=r"\.csv$", action="copy",
                        destination="/inbox",
                        target_name="livebox").execute()
    finally:
        del registry["livebox"]
    assert n == 1
    assert (root / "inbox" / "r1.csv").read_text() == "a;b\n1;2\n"


# ---------------------------------------------------------------------
# in-process paramiko SFTP server (self-activates when paramiko exists)
# ---------------------------------------------------------------------


def _make_ssh_server():
    # the skip is scoped to the SFTP tests only (importorskip at
    # module level would skip the stdlib FTP tests above as well)
    import paramiko

    class _SSHServer(paramiko.ServerInterface):
        def check_auth_password(self, username, password):
            if (username, password) == ("u", "pw"):
                return paramiko.AUTH_SUCCESSFUL
            return paramiko.AUTH_FAILED

        def get_allowed_auths(self, username):
            return "password"

        def check_channel_request(self, kind, chanid):
            return paramiko.OPEN_SUCCEEDED

    return _SSHServer()


def _make_stub_sftp(root: str):
    from paramiko import SFTPAttributes, SFTPHandle, SFTPServerInterface
    from paramiko.sftp import SFTP_OK

    class _Handle(SFTPHandle):
        def stat(self):
            return SFTPAttributes.from_stat(
                os.fstat(self.readfile.fileno()))

        def chattr(self, attr):
            return SFTP_OK

    class _StubSFTP(SFTPServerInterface):
        def _real(self, path):
            return os.path.join(root, path.lstrip("/"))

        def list_folder(self, path):
            real = self._real(path)
            out = []
            for name in os.listdir(real):
                attr = SFTPAttributes.from_stat(
                    os.stat(os.path.join(real, name)))
                attr.filename = name
                out.append(attr)
            return out

        def stat(self, path):
            return SFTPAttributes.from_stat(os.stat(self._real(path)))

        lstat = stat

        def open(self, path, flags, attr):
            real = self._real(path)
            if flags & os.O_WRONLY or flags & os.O_RDWR:
                fd = os.open(real, flags, 0o644)
            else:
                fd = os.open(real, flags)
            fobj = os.fdopen(fd, "wb" if flags & os.O_WRONLY else "rb")
            handle = _Handle(flags)
            handle.filename = real
            handle.readfile = fobj
            handle.writefile = fobj
            return handle

        def remove(self, path):
            os.remove(self._real(path))
            return SFTP_OK

        def rename(self, oldpath, newpath):
            os.rename(self._real(oldpath), self._real(newpath))
            return SFTP_OK

        def posix_rename(self, oldpath, newpath):
            os.replace(self._real(oldpath), self._real(newpath))
            return SFTP_OK

        def mkdir(self, path, attr):
            os.makedirs(self._real(path), exist_ok=True)
            return SFTP_OK

    return _StubSFTP


@pytest.fixture()
def sftp_server(tmp_path):
    paramiko = pytest.importorskip(
        "paramiko",
        reason="paramiko not installed; the SFTP wire test "
               "self-activates when it is (same env-gated pattern as "
               "the real-PIL codec test)")
    root = tmp_path / "sftp_root"
    root.mkdir()
    listener = socket.socket()
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    port = listener.getsockname()[1]
    host_key = paramiko.RSAKey.generate(2048)
    transports = []

    def accept_loop():
        while True:
            try:
                conn, _ = listener.accept()
            except OSError:
                return
            t = paramiko.Transport(conn)
            t.add_server_key(host_key)
            t.set_subsystem_handler(
                "sftp", paramiko.SFTPServer, _make_stub_sftp(str(root)))
            t.start_server(server=_make_ssh_server())
            transports.append(t)

    th = threading.Thread(target=accept_loop, daemon=True)
    th.start()
    yield port, root
    listener.close()
    for t in transports:
        t.close()


def test_sftp_transport_over_real_wire(sftp_server):
    """A genuine SSH handshake + SFTP subsystem conversation against
    the in-process paramiko server — the real client and real wire
    protocol, no scripted double anywhere (reference parity:
    sources.py:79-142 drives live paramiko)."""
    from pydin_spark.transports import SFTPTransport

    port, root = sftp_server
    (root / "a.txt").write_bytes(b"over ssh")
    (root / "sub").mkdir()
    (root / "sub" / "b.txt").write_bytes(b"deep")
    src = Server("sshbox", host="127.0.0.1", port=port,
                 protocol="sftp", user="u", password="pw")
    t = transport_for(src)
    assert isinstance(t, SFTPTransport)
    names = {os.path.basename(p) for p, _, _ in t.walk("/", True)}
    assert names == {"a.txt", "b.txt"}
    with t.open_read("/a.txt") as fh:
        assert fh.read() == b"over ssh"
    w = t.open_write("/c.bin")
    w.write(b"\x01\x02")
    w.close()
    assert (root / "c.bin").read_bytes() == b"\x01\x02"
    t.rename("/c.bin", "/d.bin")
    assert (root / "d.bin").exists()
    t.remove("/d.bin")
    assert not (root / "d.bin").exists()
    t.makedirs("/x/y")
    assert (root / "x" / "y").is_dir()
    t.close()
