"""``python -m pydin_spark`` → the Manager CLI."""

from .cli import main

raise SystemExit(main())
