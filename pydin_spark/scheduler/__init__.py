"""Orchestration control plane: cron matching, run history, scheduler.

Engine-agnostic by design (the reference never touches data from its
scheduler either) — jobs it launches own their SparkSessions.
"""

from .core import Scheduler
from .cron import Schedule, matches, parse_moment
from .history import History

__all__ = ["Scheduler", "Schedule", "History", "matches", "parse_moment"]
