"""Pipeline: node graph → steps → sequential Spark actions.

Parity target: reference ``Pipeline/Node/Step/Task`` (``pydin/core.py:
1834-2997``). The reference binds nodes via prev/next edges
(``core.py:1917-1932``; a list argument forks a branch), compiles the
graph into steps of exactly three shapes — EX, EL, ETL
(``core.py:1934-1956``, types ``core.py:2500-2508``) — and runs each step
as extractor/transformer/loader threads wired by queues
(``core.py:2840-2859``).

Spark mapping: a step is one lazy DataFrame chain ending in a write
action; Catalyst pipelines E/T/L inside whole-stage codegen, so the
reference's thread+queue machinery disappears. Branch fan-out (one
extractor, N loaders) persists the shared DataFrame once and issues N
writes. Step chaining (downstream starts when upstream ends with status
'D') is sequential action ordering.

Metrics parity (``core.py:2186-2293``): records read/written/error per
step via ``DataFrame.observe`` — computed inside the same job as the
write, no extra scan.
"""

from __future__ import annotations

import datetime as dt
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from .calendar import Day
from .models import Executable, Extractable, Loadable, Model, Transformable

#: run state machine values (reference core.py:986-1011, 2376-2441)
QUEUED, WAITING, STARTED, RUNNING, DONE, ERROR, CANCELED, TIMEOUT = \
    "Q", "W", "S", "R", "D", "E", "C", "T"


class StepError(RuntimeError):
    pass


class ErrorLimitExceeded(StepError):
    pass


class Node:
    """A model in the pipeline graph with prev/next edges."""

    def __init__(self, model: Model):
        self.model = model
        self.prev: list[Node] = []
        self.next: list[Node] = []

    def link(self, other: "Node") -> None:
        self.next.append(other)
        other.prev.append(self)

    def __repr__(self):
        return f"Node({self.model.model_name})"


class Step:
    """EX (execute), EL (extract→load) or ETL (extract→transform→load)."""

    def __init__(self, step_id: int, a: Model, b: Model | None = None,
                 c: Model | None = None):
        self.step_id = step_id
        self.a, self.b, self.c = a, b, c
        self.status: str | None = None
        self.records_read = 0
        self.records_written = 0
        self.records_error = 0
        self.result_value: int | None = None
        self.seconds = 0.0
        self.error: Exception | None = None
        #: steps that must finish 'D' before this one starts
        self.upstream: list[Step] = []

    @property
    def step_type(self) -> str:
        if self.b is None:
            return "EX"
        if self.c is None:
            return "EL"
        return "ETL"

    @property
    def extractor(self) -> Model | None:
        return self.a if self.b is not None else None

    @property
    def transformer(self) -> Model | None:
        return self.b if self.c is not None else None

    @property
    def loader(self) -> Model | None:
        if self.c is not None:
            return self.c
        if self.b is not None:
            return self.b
        return None

    def __repr__(self):
        chain = "→".join(m.model_name for m in (self.a, self.b, self.c) if m)
        return f"Step[{self.step_id}:{self.step_type}]({chain})"


class Pipeline:
    """Bind models, compile steps, run them as ordered Spark actions."""

    def __init__(self, *models, name: str | None = None, date=None,
                 spark: SparkSession | None = None, registry=None,
                 error_limit: int = 1, process_id: int | None = None,
                 data: dict | None = None, audit=None):
        self.name = name or f"pipeline-{uuid.uuid4().hex[:8]}"
        self.calendar = date if hasattr(date, "start") else \
            Day(date or dt.datetime.now())
        self.spark = spark
        self.registry = registry
        self.error_limit = error_limit
        self.process_id = process_id if process_id is not None else \
            int(time.time() * 1000) % 10**12
        self.data = data or {}
        self.audit = audit  # AuditLog → pd_query_log / pd_file_log
        self.nodes: list[Node] = []
        self.roots: list[Node] = []
        self.steps: list[Step] = []
        self.status: str | None = None
        if models:
            self.add(*models)
            self.refresh()

    # run_id/task_id aliases so KeyField lookups resolve on the pipeline
    @property
    def run_id(self):
        return self.process_id

    @property
    def task_id(self):
        return self.process_id

    # -- graph construction (reference core.py:1917-1932) -------------------
    def add(self, *models) -> None:
        previous: list[Node] = []
        for item in models:
            if isinstance(item, (list, tuple)):
                # branch fork: every element hangs off the same upstream
                branch_nodes = []
                for model in item:
                    node = self._node(model)
                    for up in previous:
                        up.link(node)
                    branch_nodes.append(node)
                previous = branch_nodes
            else:
                node = self._node(item)
                for up in previous:
                    up.link(node)
                previous = [node]
        self.roots = [n for n in self.nodes if not n.prev]

    def _node(self, model: Model) -> Node:
        model.pipeline = self
        node = Node(model)
        self.nodes.append(node)
        return node

    # -- compile (reference core.py:1934-1956) -------------------------------
    def refresh(self) -> None:
        self.steps = []
        counter = iter(range(1, len(self.nodes) + 1))
        produced: dict[int, Step] = {}  # id(node) -> step that ends at node

        def walk(node: Node, upstream_step: Step | None) -> None:
            model = node.model
            if isinstance(model, Executable):
                # a join node (several incoming edges) is walked once per
                # edge — reuse its step and merge upstreams, otherwise a
                # diamond graph would execute the model once per branch
                step = produced.get(id(node))
                if step is None:
                    step = Step(next(counter), model)
                    produced[id(node)] = step
                    self.steps.append(step)
                    if upstream_step is not None:
                        step.upstream.append(upstream_step)
                    for nxt in node.next:
                        walk(nxt, step)
                elif (upstream_step is not None
                      and upstream_step not in step.upstream):
                    step.upstream.append(upstream_step)
                return
            elif isinstance(model, Extractable):
                def _chain_step(end_node: Node, *models: Model) -> None:
                    step = produced.get(id(end_node))
                    if step is None:
                        step = Step(next(counter), *models)
                        produced[id(end_node)] = step
                        self.steps.append(step)
                        if upstream_step is not None:
                            step.upstream.append(upstream_step)
                        for after in end_node.next:
                            walk(after, step)
                    elif (upstream_step is not None
                          and upstream_step not in step.upstream):
                        step.upstream.append(upstream_step)

                def _descend(tnode: Node, collected: list) -> None:
                    # follow consecutive transformables down to the
                    # loader(s); a multi-node chain composes into ONE
                    # step-level transformer (still a single lazy plan)
                    chain = collected + [tnode.model]
                    if not tnode.next:
                        raise ValueError(
                            f"transformer {tnode.model.model_name} has no "
                            "downstream loader")
                    for after in tnode.next:
                        am = after.model
                        if isinstance(am, Transformable):
                            _descend(after, chain)
                        elif isinstance(am, Loadable):
                            from .models import TransformChain
                            tr = (chain[0] if len(chain) == 1
                                  else TransformChain(chain))
                            _chain_step(after, model, tr, am)
                        else:
                            raise ValueError(
                                f"cannot chain {chain[-1].model_name} "
                                f"into {am.model_name}")

                for nxt in node.next:
                    nxt_model = nxt.model
                    if isinstance(nxt_model, Transformable):
                        _descend(nxt, [])
                    elif isinstance(nxt_model, Loadable):
                        _chain_step(nxt, model, nxt_model)
                    else:
                        raise ValueError(
                            f"cannot chain {model.model_name} into "
                            f"{nxt_model.model_name}")
            else:
                raise ValueError(
                    f"root node {model.model_name} is neither executable "
                    "nor extractable")

        for root in self.roots:
            walk(root, None)

    def sink_for(self, source_model: Model):
        """The loader paired with an extractor (for watermark reads)."""
        for step in self.steps:
            if step.extractor is source_model:
                return step.loader
        return None

    # -- execution ----------------------------------------------------------
    def run(self, recycle: int | None = None,
            parallel: bool = True) -> "Pipeline":
        """Run all steps in dependency order.

        ``recycle=<process_id>`` first deletes that prior run's rows from
        every keyed sink (reference ``core.py:2325-2349``), making re-runs
        for the same business date idempotent.

        ``parallel=True`` (default, matching the reference's one-thread-
        per-step execution, ``core.py:2760-2768``) runs steps whose
        upstreams are complete concurrently — Spark schedules concurrent
        jobs from multiple driver threads, so independent branches (one
        extractor fanning out to N sinks, or disjoint chains) overlap
        their writes instead of serializing them.
        """
        from concurrent.futures import ThreadPoolExecutor

        if self.spark is None:
            self.spark = SparkSession.builder.getOrCreate()
        if recycle is not None:
            self._recycle(recycle)
        self.status = RUNNING
        # group steps that share an extractor → branch fan-out with persist
        by_extractor: dict[int, list[Step]] = {}
        for step in self.steps:
            if step.extractor is not None:
                by_extractor.setdefault(id(step.extractor), []).append(step)
        shared = {k for k, v in by_extractor.items() if len(v) > 1}
        done: set[int] = set()
        pending = list(self.steps)
        # cap the pool: a 500-step config pipeline must not spawn 500
        # driver threads — Spark's scheduler parallelizes within actions
        max_workers = max(min(len(self.steps), 16), 1) if parallel else 1
        try:
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                while pending:
                    ready = [s for s in pending
                             if all(u.step_id in done for u in s.upstream)]
                    if not ready:
                        raise StepError("pipeline step graph has a cycle")
                    # materialize any shared extractor once, before its
                    # consumers run concurrently
                    for step in ready:
                        if id(step.a) in shared:
                            self._materialize_shared(step)
                    futures = [pool.submit(self._run_step, s,
                                           id(s.a) in shared)
                               for s in ready]
                    for future in futures:
                        future.result()
                    for step in ready:
                        if step.status == ERROR:
                            self.status = ERROR
                            if isinstance(step.error, StepError):
                                raise step.error
                            raise StepError(f"{step} failed: "
                                            f"{step.error}") from step.error
                        done.add(step.step_id)
                        pending.remove(step)
        finally:
            # release fan-out and error-count caches — a long-lived
            # scheduler process would otherwise accumulate persisted
            # frames run after run
            cache = getattr(self, "_shared_df_cache", None)
            if cache:
                for df in cache.values():
                    df.unpersist()
                cache.clear()
            aux = getattr(self, "_aux_cache", None)
            if aux:
                for df in aux:
                    df.unpersist()
                aux.clear()
        self.status = DONE
        return self

    def _materialize_shared(self, step: Step) -> None:
        """Extract + persist a fan-out extractor's DataFrame once before
        concurrent consumers read it (avoids a persist race)."""
        cache = getattr(self, "_shared_df_cache", None)
        if cache is None:
            cache = self._shared_df_cache = {}
        extractor = step.extractor
        if extractor is None or id(extractor) in cache:
            return
        df = extractor.extract()
        df = self._enforce_error_limit(step, df)
        cache[id(extractor)] = df.persist()

    def _run_step(self, step: Step, share: bool = False) -> None:
        step.status = RUNNING
        started = time.time()
        try:
            if step.step_type == "EX":
                step.result_value = step.a.execute()  # type: ignore
            else:
                self._run_flow(step, share)
            step.status = DONE
        except Exception as exc:  # noqa: BLE001 - step error boundary
            step.status = ERROR
            step.error = exc
        finally:
            step.seconds = time.time() - started
            self._flush_query_audit(step)

    def _flush_query_audit(self, step: Step) -> None:
        """Record deferred query-log rows at ACTION time: an extractor's
        query is only 'D' once the step's action actually completed, 'E'
        when it failed (lazy plans made plan-time success records lie
        about failed actions)."""
        extractor = getattr(step, "extractor", None)
        pending = getattr(extractor, "_audit_pending", None)
        if not pending or getattr(extractor, "audit", None) is None:
            return
        started = getattr(extractor, "_audit_started", None)
        if step.status == DONE:
            extractor.audit.query(pending, "D", started=started)
        else:
            extractor.audit.query(pending, "E", started=started,
                                  error=str(step.error)[:2000])
        extractor._audit_pending = None

    def _run_flow(self, step: Step, share: bool) -> None:
        extractor, transformer, loader = step.extractor, step.transformer, \
            step.loader
        cache = getattr(self, "_shared_df_cache", None)
        if cache is None:
            cache = self._shared_df_cache = {}
        if share and id(extractor) in cache:
            df = cache[id(extractor)]
        else:
            df = extractor.extract()
            df = self._enforce_error_limit(step, df)
            if share:
                df = df.persist()
                cache[id(extractor)] = df
        read_obs = Observation(f"read-{self.name}-{step.step_id}")
        df = df.observe(read_obs, F.count(F.lit(1)).alias("rows"))
        if transformer is not None:
            df = transformer.transform(df)
        write_obs = Observation(f"write-{self.name}-{step.step_id}")
        df = df.observe(write_obs, F.count(F.lit(1)).alias("rows"))
        loader.prepare()
        loader.load(df)
        step.records_read = int(read_obs.get["rows"])
        step.records_written = int(write_obs.get["rows"])
        loader_errors = getattr(loader, "records_error", 0)
        if loader_errors:
            step.records_error += loader_errors
            step.records_written -= loader_errors

    def _enforce_error_limit(self, step: Step, df: DataFrame) -> DataFrame:
        """PERMISSIVE-read error budget (reference models.py:280-291):
        count malformed rows; abort once the budget is hit, else drop them.
        """
        if "_corrupt_record" not in df.columns or self.error_limit is None:
            return df
        # Spark refuses to query only the internal corrupt column from a raw
        # file scan; cache the parsed result first (per its own guidance).
        df = df.cache()
        aux = getattr(self, "_aux_cache", None)
        if aux is None:
            aux = self._aux_cache = []
        aux.append(df)  # released in run()'s finally
        corrupt = df.where(F.col("_corrupt_record").isNotNull())
        n_bad = corrupt.count()
        step.records_error = n_bad
        if n_bad >= self.error_limit:
            raise ErrorLimitExceeded(
                f"{n_bad} malformed records >= error_limit="
                f"{self.error_limit}")
        return (df.where(F.col("_corrupt_record").isNull())
                  .drop("_corrupt_record"))

    def _recycle(self, process_id: int) -> None:
        for step in self.steps:
            loader = step.loader
            if loader is None:
                continue
            key = getattr(loader, "key_field", None)
            if key is not None:
                loader.recycle(key.label, process_id)

    # -- reporting ----------------------------------------------------------
    @property
    def records_read(self) -> int:
        return sum(s.records_read for s in self.steps)

    @property
    def records_written(self) -> int:
        return sum(s.records_written for s in self.steps)

    @property
    def records_error(self) -> int:
        return sum(s.records_error for s in self.steps)

    def summary(self) -> dict:
        return {
            "name": self.name,
            "status": self.status,
            "process_id": self.process_id,
            "steps": [
                {
                    "step": repr(s), "status": s.status,
                    "records_read": s.records_read,
                    "records_written": s.records_written,
                    "records_error": s.records_error,
                    "result_value": s.result_value,
                    "seconds": round(s.seconds, 3),
                }
                for s in self.steps
            ],
        }
