"""Worker for the 2-process jax.distributed parity test.

Launched by tests/test_multiprocess.py as ``python tests/dist_worker.py
<coordinator> <nprocs> <pid>``. Each process owns 2 virtual CPU devices
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=2 set by the
parent), so the global mesh spans 4 devices across 2 OS processes — the
real multi-host code path (non-addressable shards, cross-process
collectives over Gloo), not the single-process virtual-mesh shortcut.

Checks (process-0 prints one "OK <json>" line the parent asserts on):
  * sharded utf8 validate: (0, total) on the clean corpus
  * sharded utf8->utf16le transcode: unit total + per-process local
    output shards reassemble to the CPython-encoded expectation
  * injected error: min-reduced global first-error == exact byte index
  * sharded count == len(decode)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    import numpy as np

    from simdutf_tpu.errors import error_code as ec
    from simdutf_tpu.parallel import (
        make_mesh,
        plan_shards,
        transcode_utf8_to_utf16_sharded,
        validate_utf8_sharded,
    )
    from simdutf_tpu.parallel.distributed import (
        count_sharded,
        local_shards,
    )

    n_dev = len(jax.devices())
    assert n_dev == 2 * nprocs, (n_dev, nprocs)
    mesh = make_mesh(n_dev)
    data = ("multi-host héllo 日本語 🙂 " * (n_dev * 41)).encode()

    plan = plan_shards(data, n_dev)
    code, pos = validate_utf8_sharded(plan, mesh)
    assert (code, pos) == (0, len(data)), (code, pos)

    code, units, outs, out_lens = transcode_utf8_to_utf16_sharded(plan, mesh)
    expect = data.decode().encode("utf-16-le")
    assert code == 0 and units * 2 == len(expect), (code, units)

    # every process materializes ONLY its addressable output shards; the
    # parent reassembles both processes' pieces and compares to CPython
    mine = local_shards(outs, out_lens)
    lens = [int(x) for x in out_lens]
    pieces = {
        k: arr.astype("<u2").tobytes().hex() for k, arr in mine
    }

    # exact global first-error across processes
    bad = bytearray(data)
    inject = 2 * len(bad) // 3  # lands in the second process's half
    bad[inject] = 0xFF
    planb = plan_shards(bytes(bad), n_dev)
    code, pos = validate_utf8_sharded(planb, mesh)
    assert (code, pos) == (int(ec.HEADER_BITS), inject), (code, pos, inject)

    n_cp = count_sharded(plan, mesh, "utf8")
    assert n_cp == len(data.decode()), n_cp

    # sharded forgiving base64 across processes: whitespace + '=' padding
    # exercises every cross-process _host_view site incl. the final-shard
    # tail fetch (tails/tstarts live on the LAST process's devices)
    import base64 as pyb64

    from simdutf_tpu.parallel.distributed import base64_to_binary_sharded
    from simdutf_tpu.parallel.planner import plan_shards_base64

    payload = data[: 3 * (len(data) // 3) + 1]  # force '=' padding
    b64 = bytearray(pyb64.b64encode(payload))
    for k in range(40, len(b64), 97):
        b64.insert(k, ord(" "))
    b64 = bytes(b64)
    planb = plan_shards_base64(b64, n_dev)
    full, packed, out_lens_b, extra = base64_to_binary_sharded(
        b64, planb, mesh
    )
    assert full.error == 0, full
    assert full.output_count == len(payload), (full, len(payload))
    from simdutf_tpu.parallel.distributed import local_shards

    mine_b = local_shards(packed, out_lens_b)
    local_b64_bytes = sum(a.shape[0] for _, a in mine_b)
    assert local_b64_bytes >= 0

    print(
        "PIECES "
        + json.dumps({"pid": pid, "lens": lens, "pieces": pieces}),
        flush=True,
    )
    if pid == 0:
        print(
            "OK "
            + json.dumps(
                {
                    "devices": n_dev,
                    "processes": nprocs,
                    "units": units,
                    "expect_hex_len": len(expect) * 2,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
