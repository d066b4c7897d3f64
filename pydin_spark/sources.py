"""Named connection registry: name → filesystem / JDBC / server endpoint.

Parity target: reference ``Connector`` (``pydin/utils.py:1194-1290``) and
``Localhost/Server/Database`` (``pydin/sources.py:20-142``): named
connections declared in ``~/.pydin/sources.ini`` are materialized lazily
and attached to models by ``source_name``.

Spark-era shape: a ``Database`` is a dict of JDBC reader/writer options
(Spark's JDBC source does the pooling/partitioned fetch), a
``Filesystem`` is a base URI any Hadoop-compatible FS understands
(file:/, hdfs:/, s3a:/, abfss:/ — pathless at 100 TB because the data
never moves through the driver), and a ``Server`` (SSH/SFTP/FTP) stays a
driver-side endpoint used only by FileManager-style utility nodes.

No external secrets dependency: credentials come from the INI file or
``PYDIN_SOURCE_<NAME>_<KEY>`` environment variables.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field


@dataclass
class Filesystem:
    """A Hadoop-compatible filesystem root (local, HDFS, S3, ABFS...)."""

    name: str
    base: str = ""

    def path(self, *parts: str) -> str:
        clean = [p.strip("/") for p in parts if p]
        root = self.base.rstrip("/")
        return "/".join([root, *clean]) if root else "/".join(clean)


@dataclass
class Database:
    """A JDBC endpoint. ``options()`` feeds spark.read/write.format('jdbc')."""

    name: str
    url: str
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    extra: dict[str, str] = field(default_factory=dict)

    def options(self, **overrides: str) -> dict[str, str]:
        opts = {"url": self.url}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        opts.update(self.extra)
        opts.update(overrides)
        return opts


@dataclass
class Server:
    """A remote host reached over SSH/SFTP/FTP (driver-side file ops only).

    The transport clients (paramiko/ftplib) are imported lazily so the
    engine runs in environments without them; FileManager raises a clear
    error if a remote action is requested and the client is missing.
    """

    name: str
    host: str
    port: int = 22
    protocol: str = "sftp"  # sftp | ftp | ssh
    user: str | None = None
    password: str | None = None
    key_file: str | None = None


class SourceRegistry(dict):
    """name → Filesystem | Database | Server. Case-insensitive lookup."""

    DEFAULT_INI = "~/.pydin_spark/sources.ini"

    def __init__(self, ini_path: str | None = None, autoload: bool = True):
        super().__init__()
        self.ini_path = os.path.expanduser(ini_path or self.DEFAULT_INI)
        # localhost filesystem is always present (reference sources.py:20-31)
        self.register(Filesystem("localhost", ""))
        if autoload and os.path.exists(self.ini_path):
            self.load_ini(self.ini_path)

    def register(self, source) -> None:
        self[source.name.lower()] = source

    def resolve(self, name: str):
        try:
            return self[name.lower()]
        except KeyError:
            raise KeyError(f"unknown source {name!r}; known: {sorted(self)}")

    def load_ini(self, path: str) -> None:
        parser = configparser.ConfigParser()
        parser.read(path)
        for section in parser.sections():
            conf = {k: v for k, v in parser.items(section)}
            conf = self._overlay_env(section, conf)
            kind = conf.pop("kind", "database" if "url" in conf else
                            "server" if "host" in conf else "filesystem")
            if kind == "database":
                known = {k: conf.pop(k) for k in
                         ("url", "user", "password", "driver") if k in conf}
                self.register(Database(section, extra=conf, **known))
            elif kind == "server":
                self.register(Server(
                    section, host=conf.get("host", "localhost"),
                    port=int(conf.get("port", 22)),
                    protocol=conf.get("protocol", "sftp"),
                    user=conf.get("user"), password=conf.get("password"),
                    key_file=conf.get("key_file")))
            else:
                self.register(Filesystem(section, conf.get("base", "")))

    @staticmethod
    def _overlay_env(section: str, conf: dict) -> dict:
        prefix = f"PYDIN_SOURCE_{section.upper()}_"
        for key, value in os.environ.items():
            if key.startswith(prefix):
                conf[key.removeprefix(prefix).lower()] = value
        return conf


#: Process-wide default registry; models resolve ``source_name`` here
#: unless a pipeline supplies its own.
registry = SourceRegistry()
