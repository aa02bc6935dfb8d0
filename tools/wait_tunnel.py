"""Wait for the TPU tunnel to come back, then run the on-chip queue.

The axon tunnel can wedge for hours (device claim blocks forever, no
error — docs/PERF.md round-3 environment note), and the plugin ignores
``JAX_PLATFORMS=cpu`` set via env, so the only safe probe is a CHILD
process with a hard timeout.  On recovery this launches
``tools/onchip_queue.sh`` — keep every queued on-chip measurement in ONE
serialized script, because the tunnel serializes access and concurrent
claimers see FAILED_PRECONDITION.

Usage:
    python tools/wait_tunnel.py [queue.sh] & echo $! > /tmp/tunnel_wait.pid
"""

import subprocess
import sys
import time

PROBE = "import jax\nprint('DEVICES:', jax.devices())\n"


def main() -> None:
    queue = sys.argv[1] if len(sys.argv) > 1 else "tools/onchip_queue.sh"
    for attempt in range(200):
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", PROBE],
                               capture_output=True, text=True, timeout=240)
            out = r.stdout + r.stderr
        except subprocess.TimeoutExpired:
            out = ""
        if "DEVICES:" in out:
            print(f"attempt {attempt}: TUNNEL UP after {time.time()-t0:.0f}s",
                  flush=True)
            print(out.strip().splitlines()[-1], flush=True)
            print(f"launching {queue}...", flush=True)
            subprocess.run(["bash", queue])
            print("queue finished", flush=True)
            break
        print(f"attempt {attempt}: no devices in {time.time()-t0:.0f}s",
              flush=True)
        time.sleep(120)
    else:
        print("gave up", flush=True)


if __name__ == "__main__":
    main()
