"""Driver-side file transports for :class:`pydin_spark.models.FileManager`.

Reference ``FileManager`` (``pydin/models.py:1664-2392``) implements a
12-way localhost/SSH/SFTP/FTP source×target dispatch with one method per
combination (e.g. sftp→sftp ``models.py:2081-2126``, local copy
``1926-1960``, deletes ``2358-2390``). Here a single ``Transport``
interface collapses the matrix: any source transport streams into any
target transport, so every combination shares one copy path and
gzip/tempname semantics are applied uniformly — N transports give N²
combinations for free instead of N² hand-written methods.

``paramiko`` is not installed in every environment, so the SFTP client
is imported lazily and only when an SFTP endpoint is actually used;
:class:`MemoryTransport` is a faithful in-memory double for exercising
the full remote matrix in tests (and doubles as a mock endpoint when a
``Server`` carries ``transport=``).
"""

from __future__ import annotations

import datetime as dt
import io
import os
import posixpath
import shutil


class Transport:
    """Minimal filesystem surface FileManager needs from an endpoint."""

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    def basename(self, path: str) -> str:
        return posixpath.basename(path)

    def walk(self, path: str, recursive: bool = False):
        """Yield ``(path, mtime datetime, size)`` for files under path."""
        raise NotImplementedError

    def open_read(self, path: str):
        raise NotImplementedError

    def open_write(self, path: str):
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def execute(self, command: str,
                timeout: float | None = None) -> tuple[int, str, str]:
        """Run a shell command on the endpoint's host; return
        ``(exit_status, stdout, stderr)``. Reference parity:
        ``conn.execute`` over ``ssh.exec_command``
        (``pydin/sources.py:79-81``) — the remote cleanup/trigger hook
        an Executable drives. Endpoints without a command channel
        (plain FTP) raise."""
        raise NotImplementedError(
            f"{type(self).__name__} has no remote-command channel")

    def close(self) -> None:
        pass


class LocalTransport(Transport):
    """The localhost quadrant (reference ``Localhost``)."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def basename(self, path: str) -> str:
        return os.path.basename(path)

    def walk(self, path: str, recursive: bool = False):
        for dirpath, dirnames, filenames in os.walk(path):
            if not recursive:
                dirnames.clear()
            for name in sorted(filenames):
                full = os.path.join(dirpath, name)
                st = os.stat(full)
                yield (full, dt.datetime.fromtimestamp(st.st_mtime),
                       st.st_size)

    def open_read(self, path: str):
        return open(path, "rb")

    def open_write(self, path: str):
        return open(path, "wb")

    def remove(self, path: str) -> None:
        os.remove(path)

    def execute(self, command: str,
                timeout: float | None = None) -> tuple[int, str, str]:
        import subprocess
        proc = subprocess.run(command, shell=True, capture_output=True,
                              text=True, timeout=timeout)
        return proc.returncode, proc.stdout, proc.stderr

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class MemoryTransport(Transport):
    """In-memory endpoint: the test double for the remote matrix.

    POSIX-style paths over a flat ``{path: bytes}`` store (directories
    are implicit, like object stores); mtimes are recorded per write so
    date-window filtering works.
    """

    def __init__(self):
        self.files: dict[str, bytes] = {}
        self.mtimes: dict[str, dt.datetime] = {}
        # remote-exec double: commands run are recorded; handlers map a
        # command string to its scripted (exit, stdout, stderr)
        self.commands: list[str] = []
        self.handlers: dict[str, tuple[int, str, str]] = {}

    def put(self, path: str, data: bytes,
            mtime: dt.datetime | None = None) -> None:
        self.files[path] = data
        self.mtimes[path] = mtime or dt.datetime.now()

    def walk(self, path: str, recursive: bool = False):
        root = path.rstrip("/") + "/"
        for full in sorted(self.files):
            if not full.startswith(root):
                continue
            rel = full[len(root):]
            if not recursive and "/" in rel:
                continue
            yield full, self.mtimes[full], len(self.files[full])

    def open_read(self, path: str):
        if path not in self.files:
            raise FileNotFoundError(path)
        return io.BytesIO(self.files[path])

    def open_write(self, path: str):
        transport = self

        class _Writer(io.BytesIO):
            def close(self) -> None:
                transport.put(path, self.getvalue())
                super().close()

        return _Writer()

    def remove(self, path: str) -> None:
        if path not in self.files:
            raise FileNotFoundError(path)
        del self.files[path]
        del self.mtimes[path]

    def rename(self, src: str, dst: str) -> None:
        self.files[dst] = self.files.pop(src)
        self.mtimes[dst] = self.mtimes.pop(src)

    def makedirs(self, path: str) -> None:
        pass  # directories are implicit

    def execute(self, command: str,
                timeout: float | None = None) -> tuple[int, str, str]:
        self.commands.append(command)
        return self.handlers.get(command, (0, "", ""))


class SFTPTransport(Transport):
    """SFTP endpoint over paramiko (reference SFTP quadrants,
    ``models.py:2081-2126``). paramiko is imported lazily — construction
    fails with a clear message when it is absent."""

    def __init__(self, server):
        try:
            import paramiko
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "SFTP endpoints need paramiko; install it or inject a "
                "transport= double on the Server") from exc
        self._client = paramiko.SSHClient()
        self._client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        self._client.connect(
            server.host, port=server.port or 22, username=server.user,
            password=server.password, key_filename=server.key_file)
        self.sftp = self._client.open_sftp()

    def walk(self, path: str, recursive: bool = False):
        import stat as _stat
        for attr in self.sftp.listdir_attr(path):
            full = posixpath.join(path, attr.filename)
            if _stat.S_ISDIR(attr.st_mode):
                if recursive:
                    yield from self.walk(full, recursive)
                continue
            yield (full, dt.datetime.fromtimestamp(attr.st_mtime),
                   attr.st_size)

    def open_read(self, path: str):
        return self.sftp.open(path, "rb")

    def open_write(self, path: str):
        return self.sftp.open(path, "wb")

    def remove(self, path: str) -> None:
        self.sftp.remove(path)

    def rename(self, src: str, dst: str) -> None:
        # posix_rename overwrites atomically where the server supports it
        try:
            self.sftp.posix_rename(src, dst)
        except OSError:
            self.sftp.rename(src, dst)

    def makedirs(self, path: str) -> None:
        parts = path.strip("/").split("/")
        cur = "/" if path.startswith("/") else ""
        for part in parts:
            cur = posixpath.join(cur, part) if cur else part
            try:
                self.sftp.stat(cur)
            except FileNotFoundError:
                self.sftp.mkdir(cur)

    def execute(self, command: str,
                timeout: float | None = None) -> tuple[int, str, str]:
        # same SSHClient the SFTP channel rides on — one connection,
        # both file ops and remote commands (reference sources.py:79-81)
        _stdin, stdout, stderr = self._client.exec_command(
            command, timeout=timeout)
        out = stdout.read().decode()
        err = stderr.read().decode()
        status = stdout.channel.recv_exit_status()
        return status, out, err

    def close(self) -> None:
        self.sftp.close()
        self._client.close()


class FTPTransport(Transport):
    """FTP endpoint over stdlib ftplib (reference FTP quadrants,
    ``models.py:2128-2392``). Reads/writes are spooled through a temp
    buffer because ftplib's API is callback-based."""

    def __init__(self, server):
        import ftplib
        self.ftp = ftplib.FTP()
        self.ftp.connect(server.host, server.port or 21)
        self.ftp.login(server.user or "anonymous", server.password or "")

    def walk(self, path: str, recursive: bool = False):
        entries = list(self.ftp.mlsd(path))
        for name, facts in entries:
            if name in (".", ".."):
                continue
            full = posixpath.join(path, name)
            if facts.get("type") == "dir":
                if recursive:
                    yield from self.walk(full, recursive)
                continue
            mtime = dt.datetime.strptime(
                facts.get("modify", "19700101000000")[:14], "%Y%m%d%H%M%S")
            yield full, mtime, int(facts.get("size", 0))

    def open_read(self, path: str):
        import tempfile
        buf = tempfile.SpooledTemporaryFile(max_size=1 << 24)
        self.ftp.retrbinary(f"RETR {path}", buf.write)
        buf.seek(0)
        return buf

    def open_write(self, path: str):
        import tempfile
        ftp = self.ftp

        class _Upload:
            """Spool locally, STOR on close. A real wrapper class, not
            an instance-attribute ``close`` hook: SpooledTemporaryFile
            ``__exit__`` closes its INNER file directly, so a hook
            patched onto the instance never fires under ``with`` — the
            upload silently never happened (found by the live-FTP
            wire test, VERDICT r9 #4)."""

            def __init__(self):
                self._buf = tempfile.SpooledTemporaryFile(
                    max_size=1 << 24)
                self._done = False

            def __getattr__(self, name):
                return getattr(self._buf, name)

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.close()

            def close(self):
                if self._done:
                    return
                self._done = True
                self._buf.seek(0)
                try:
                    ftp.storbinary(f"STOR {path}", self._buf)
                finally:
                    self._buf.close()

        return _Upload()

    def remove(self, path: str) -> None:
        self.ftp.delete(path)

    def rename(self, src: str, dst: str) -> None:
        self.ftp.rename(src, dst)

    def makedirs(self, path: str) -> None:
        parts = path.strip("/").split("/")
        cur = "/" if path.startswith("/") else ""
        for part in parts:
            cur = posixpath.join(cur, part) if cur else part
            try:
                self.ftp.mkd(cur)
            except Exception:  # noqa: BLE001 - already exists
                pass

    def close(self) -> None:
        try:
            self.ftp.quit()
        except Exception:  # noqa: BLE001
            self.ftp.close()


def transport_for(source) -> Transport:
    """Resolve a registry source (or None) to a Transport.

    ``Server`` objects may carry an injected ``transport`` attribute
    (test double / custom endpoint); otherwise the protocol picks the
    client: sftp/ssh → paramiko SFTP, ftp → ftplib.
    """
    if source is None:
        return LocalTransport()
    if isinstance(source, Transport):
        return source
    injected = getattr(source, "transport", None)
    if injected is not None:
        return injected
    protocol = getattr(source, "protocol", None)
    if protocol in ("sftp", "ssh"):
        return SFTPTransport(source)
    if protocol == "ftp":
        return FTPTransport(source)
    return LocalTransport()
