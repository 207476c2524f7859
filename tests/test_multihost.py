"""Two-process gateway over the distributed runtime (VERDICT r1 #3).

Spawns two real OS processes (4 virtual CPU devices each), forms one
8-device {ch:1, t:8} mesh spanning both, and decodes a capture whose
channel-1 packet STRADDLES the process seam — proving halo exchange and
single-decode ownership work across process (DCN-analog) boundaries, and
that replicated result gathering gives both hosts the same PDU set.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gateway_with_seam_packet():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)   # worker forces cpu via jax.config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    a, b = outs
    # Disjoint halves of the stream...
    assert a["range"][1] == b["range"][0]
    # ...but identical, complete result sets on both hosts (replicated).
    assert a["packets"] == b["packets"], (a, b)
    assert a["dropped"] == 0
    pkts = a["packets"]
    # Both channels' packets decoded exactly once, channel 1's spanning
    # the seam.
    chans = sorted(p[0] for p in pkts)
    assert chans == [0, 1], pkts
    for c, pos, pdu in pkts:
        assert pdu.startswith(a["expected_payload"]), pkts
        # pos is the preamble-detection index: a few symbols into the
        # packet (4 consecutive argmax windows + prefill).
        assert 0 <= pos - a["offs"][c] <= 8 * 128, (pos, a["offs"][c])


_PYR_WORKER = os.path.join(os.path.dirname(__file__),
                           "multihost_pyramid_worker.py")


def test_two_process_pyramid_gateway():
    """Gateway-scale COLLISION decoding across two processes: the lattice
    is shard_mapped over the spanning {ch, t} mesh; each host's tracker
    bank owns its channel row and decodes both README golden PDUs for it."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, _PYR_WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    pdu1 = "0630f0010203040506050801"
    pdu2 = "053000" + "07" * 5 + "e76b01"
    for r in outs:
        mine = [(c, h) for c, h, _ in r["pdus"]]
        # Every PDU this host reports is for ITS channel...
        assert all(c == r["pid"] for c, _ in mine), r
        # ...and both golden payloads are there exactly once.
        assert mine.count((r["pid"], pdu1)) == 1, r
        assert mine.count((r["pid"], pdu2)) == 1, r
        # Positions near the channel's injected base offset.
        for c, h, pos in r["pdus"]:
            assert 0 <= pos - r["base"] <= 40 * 512, r


_DEV_WORKER = os.path.join(os.path.dirname(__file__),
                           "multihost_device_tracker_worker.py")


def test_two_process_device_tracker_gateway():
    """tracker='device' across two processes (VERDICT r3 task 3): same
    mesh/fixture as the host-tracker case, identical PDUs, and each
    process's device->host fetch is packet-sized (the [C] counter + the
    popped output pools), not lattice-sized."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, _DEV_WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    pdu1 = "0630f0010203040506050801"
    pdu2 = "053000" + "07" * 5 + "e76b01"
    for r in outs:
        mine = [(c, h) for c, h, _ in r["pdus"]]
        assert all(c == r["pid"] for c, _ in mine), r
        assert mine.count((r["pid"], pdu1)) == 1, r
        assert mine.count((r["pid"], pdu2)) == 1, r
        assert r["stats"]["deviations"] == 0, r
        # The fetch is packets + counters, not peak lattices: the host-
        # tracker layout moves ~block_hops*max_peaks*8 B per channel per
        # block (hundreds of KB here); device mode stays under 64 KB.
        assert r["fetched_bytes"] < 64 * 1024, r["fetched_bytes"]


_TRIG_WORKER = os.path.join(os.path.dirname(__file__),
                            "multihost_triggered_worker.py")


def test_two_process_triggered_gateway():
    """Detection-gated (north-star) gateway with channels split across two
    processes (VERDICT r3 task 2): 8 channels sharded 'ch' over the
    spanning mesh, the golden two-packet collision on every channel;
    each process emits exactly its own channels' PDUs, and the union
    covers every channel exactly once."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, _TRIG_WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    pdu1 = "0630f0010203040506050801"
    pdu2 = "053000" + "07" * 5 + "e76b01"
    seen = {}
    for r in outs:
        own = set(r["own"])
        # Disjoint ownership; every emitted PDU is for an owned channel.
        for c, h, pos in r["pdus"]:
            assert c in own, r
            seen.setdefault(c, []).append(h)
            assert 0 <= pos - r["bases"][str(c)] <= 40 * 512, r
    assert set(outs[0]["own"]).isdisjoint(outs[1]["own"])
    channels = outs[0]["channels"]
    assert set(seen) == set(range(channels)), seen
    for c, hexes in seen.items():
        assert sorted(hexes) == sorted([pdu1, pdu2]), (c, hexes)


_PYR_T_WORKER = os.path.join(os.path.dirname(__file__),
                             "multihost_pyramid_time_worker.py")


def test_two_process_time_only_pyramid_gateway():
    """Time-ONLY multihost collision sharding (VERDICT r2 weak #7): one
    channel row spanning both processes ({ch:1, t:8}).  The lattice is
    computed split along time over the process seam, the row's peaks are
    all_gathered on-device, and the owning process (first t-shard) decodes
    both golden PDUs exactly once; the other process returns none."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, _PYR_T_WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    pdu1 = "0630f0010203040506050801"
    pdu2 = "053000" + "07" * 5 + "e76b01"
    by_pid = {r["pid"]: r for r in outs}
    owner, other = by_pid[0], by_pid[1]
    hexes = [h for _, h, _ in owner["pdus"]]
    assert hexes.count(pdu1) == 1 and hexes.count(pdu2) == 1, owner
    assert other["pdus"] == [], other
    assert owner["local_channels"] == 1 and other["local_channels"] == 0
    for _, _, pos in owner["pdus"]:
        assert 0 <= pos - owner["base"] <= 40 * 512, owner
