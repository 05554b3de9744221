"""_CotenantSampler invariants (round 13): the direct co-tenant CPU
measurement must attribute THIS process tree's work to the tree — even
across child exit, the failure mode that produced physically impossible
peaks (84/153 'cores' on a 32-core machine) on the first r13 draws —
while still detecting genuinely external load.

Thresholds are deliberately loose (CI machines carry background noise);
the point pinned here is the ORDER OF MAGNITUDE: own-tree work must not
leak into the co-tenant estimate wholesale, and external work must not
vanish from it."""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

if not os.path.isdir("/proc"):  # pragma: no cover
    pytest.skip("sampler needs /proc", allow_module_level=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _CotenantSampler  # noqa: E402

BURN = "t=__import__('time').time()\nwhile __import__('time').time()-t<{dur}: pass"


def _steal_ticks() -> int:
    """Aggregate guest steal ticks (/proc/stat cpu field 8, 0 when the
    platform doesn't report it). Hypervisor co-tenancy lands in steal,
    which the sampler COUNTS as external CPU — correct for the bench
    (host contention distorts timings exactly like a guest co-tenant),
    but it breaks the quiet-host premise of the two leak tests below:
    round 14 watched `test_dying_child...` fail inside full-suite runs
    on a host whose draws were intermittently ~35% hot with <1.3
    guest-visible co-tenant cores. The guard skips, never weakens, the
    assertion."""
    with open("/proc/stat") as f:
        vals = f.readline().split()[1:]
    return int(vals[7]) if len(vals) > 7 else 0


def _skip_if_host_stole(steal0: int, t0: float, limit: float = 0.25) -> None:
    """``t0`` is the monotonic stamp taken WITH ``steal0``: the steal
    delta spans the whole capture-to-check interval (Popen spawn,
    sampler setup, p.wait — not just the nominal sample window), so
    dividing by anything shorter overestimates steal_cores and skips
    more eagerly than the quarter-core limit intends (ADVICE r14)."""
    elapsed = time.monotonic() - t0
    steal_cores = (_steal_ticks() - steal0) / os.sysconf("SC_CLK_TCK") / elapsed
    if steal_cores > limit:
        pytest.skip(
            f"hypervisor stole {steal_cores:.2f} cores during the window — "
            "the quiet-host premise does not hold; the sampler is "
            "CORRECTLY reporting external CPU"
        )


def _measure(setup=None, window=2.2):
    s = _CotenantSampler()
    s.sample()
    if setup is not None:
        setup()
    time.sleep(window)
    s.sample()
    cot = s.cotenant_cores()
    assert cot is not None
    return cot


def test_sampler_returns_none_without_intervals():
    assert _CotenantSampler().cotenant_cores() is None


def test_own_child_burn_not_attributed_to_cotenant():
    """A CHILD burning a full core for the window is our own work."""
    steal0, t0 = _steal_ticks(), time.monotonic()
    p = subprocess.Popen([sys.executable, "-c", BURN.format(dur=1.8)])
    try:
        mean, _peak = _measure()
    finally:
        p.wait()
    if mean >= 0.6:
        _skip_if_host_stole(steal0, t0)
    assert mean < 0.6, f"own child's core leaked into co-tenant estimate: {mean}"


def test_dying_child_ticks_do_not_spike_cotenant():
    """The r13 failure mode: a child that burns ACROSS the first sample
    then exits before the second must cost at most its final partial
    interval — not re-attribute its lifetime CPU to the co-tenant."""
    steal0, t0 = _steal_ticks(), time.monotonic()
    p = subprocess.Popen([sys.executable, "-c", BURN.format(dur=0.9)])
    time.sleep(0.2)  # child is alive and burning at the first sample
    s = _CotenantSampler()
    s.sample()
    p.wait()  # dies (and is reaped) inside the window
    time.sleep(1.8)
    s.sample()
    mean, _peak = s.cotenant_cores()
    if mean >= 0.6:
        _skip_if_host_stole(steal0, t0)
    assert mean < 0.6, f"dying child's lifetime re-attributed to co-tenant: {mean}"


def test_external_burner_is_detected():
    """A double-fork orphan (reparented to init — NOT in our tree) is a
    real co-tenant and must show up at roughly its true size."""
    if os.getpid() == 1:
        pytest.skip(
            "test runner is pid 1: the orphan reparents to US and is"
            " correctly classified own-tree, vacating the premise"
        )
    pid = os.fork()
    if pid == 0:  # pragma: no cover - child process
        if os.fork() == 0:
            os.setsid()
            t = time.time()
            while time.time() - t < 2.8:
                pass
            os._exit(0)
        os._exit(0)
    os.waitpid(pid, 0)
    time.sleep(0.2)
    mean, peak = _measure(window=2.0)
    assert mean > 0.5, f"external burner invisible to the estimate: {mean}"
    ncpu = os.cpu_count() or 32
    assert peak <= ncpu, f"peak exceeds the machine: {peak}"


def test_iowait_field_present_and_sane():
    """Round 14: intervals carry a machine-wide iowait delta; the mean
    must exist after a window and be a small non-negative number on a
    quiet machine (it is cores-of-iowait, bounded by ncpu)."""
    s = _CotenantSampler()
    assert s.iowait_cores() is None
    s.sample()
    time.sleep(1.2)
    s.sample()
    io = s.iowait_cores()
    assert io is not None and 0.0 <= io <= (os.cpu_count() or 32)
    # and the intervals themselves are the 4-tuple shape
    assert all(len(iv) == 4 for iv in s.intervals)


def test_negative_iowait_delta_clamped_per_interval():
    """proc(5): the aggregate iowait counter can DECREASE. A negative
    interval delta must be clamped to 0 at append time — an unclamped
    one would cancel real disk-wait from other intervals inside
    iowait_cores()'s sum, under-reporting the exact dimension the field
    exists to expose (round-14 review finding). Simulated by inflating
    the stored last-iowait so the next real sample reads as a
    decrease."""
    s = _CotenantSampler()
    s.sample()
    assert s._last is not None
    s._last = (s._last[0], s._last[1], s._last[2] + 10**9)
    time.sleep(0.2)
    s.sample()
    assert s.intervals and s.intervals[-1][3] == 0


def test_truncated_pid_stat_is_skipped_not_fatal(monkeypatch):
    """ADVICE r13: a zero-length/truncated /proc/<pid>/stat read during
    pid teardown must skip that pid, not escape sample() and kill the
    draw. Simulated by injecting one bad read into the real scan."""
    real_open = open
    poisoned = {"done": False}

    def bad_open(path, *a, **k):
        f = real_open(path, *a, **k)
        if (
            not poisoned["done"]
            and isinstance(path, str)
            and path.startswith("/proc/")
            and path.endswith("/stat")
            and path != "/proc/stat"
        ):
            poisoned["done"] = True

            class Trunc:
                def read(self):
                    return ""  # teardown race: empty content

                def readline(self):
                    return ""

                def __enter__(self):
                    return self

                def __exit__(self, *exc):
                    f.close()
                    return False

            return Trunc()
        return f

    import builtins

    s = _CotenantSampler()
    monkeypatch.setattr(builtins, "open", bad_open)
    s.sample()  # must not raise
    assert poisoned["done"], "premise: at least one pid stat was read"
