"""Task DAG runner — the engine's analog of Snowflake tasks
(reference ``ingest-dag.sql:1-3``, ``etl-dag.sql:1-5`` + ``AFTER``
edges; SURVEY §2.10 T1-T4).

A ``Task`` is a named Python callable with ``AFTER`` dependencies and
an optional cron string (informational — scheduling is delegated to an
external scheduler, as Snowflake delegates to its task engine; the
runner only guarantees topological order). ``resume()``/``suspend()``
mirror ``ALTER TASK … RESUME``; ``run()`` executes one DAG pass;
``run_task()`` is ``EXECUTE TASK``; ``show()`` is ``SHOW TASKS``.

Tasks with satisfied dependencies could run concurrently (the
reference's tasks 1&2 do); the runner executes them sequentially in a
deterministic topological order — on Spark, intra-job parallelism
dominates and the modelling DAG's tasks are dependent storage
barriers anyway (SURVEY §3-EP3).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    after: Sequence[str] = ()
    schedule: str | None = None  # cron, informational
    enabled: bool = True


@dataclass
class TaskDag:
    tasks: dict[str, Task] = field(default_factory=dict)

    def add(self, name: str, fn: Callable[[], object],
            after: Sequence[str] = (), schedule: str | None = None) -> Task:
        t = Task(name=name, fn=fn, after=tuple(after), schedule=schedule)
        self.tasks[name] = t
        return t

    def resume(self, name: str) -> None:
        self.tasks[name].enabled = True

    def suspend(self, name: str) -> None:
        self.tasks[name].enabled = False

    def order(self) -> list[str]:
        ts = TopologicalSorter(
            {n: list(t.after) for n, t in self.tasks.items()}
        )
        return list(ts.static_order())

    def run(self) -> dict[str, object]:
        """One DAG pass in topological order. A disabled task is
        skipped along with its whole downstream subtree (Snowflake
        suspended-task semantics)."""
        results: dict[str, object] = {}
        skipped: set[str] = set()
        for name in self.order():
            t = self.tasks[name]
            if not t.enabled or any(dep in skipped for dep in t.after):
                skipped.add(name)
                continue
            results[name] = t.fn()
        return results

    def run_task(self, name: str) -> object:
        """EXECUTE TASK — run one task immediately, ignoring edges."""
        return self.tasks[name].fn()

    def show(self) -> list[dict[str, object]]:
        return [
            {
                "name": t.name,
                "after": list(t.after),
                "schedule": t.schedule,
                "state": "started" if t.enabled else "suspended",
            }
            for t in self.tasks.values()
        ]
