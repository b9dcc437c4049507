"""Double-buffered host->device prefetch.

The reference fed every step through feed_dict (a synchronous host->device
copy inside sess.run, encoder.py:256-263) and pulled h5py rows per step on
the training thread — its input pipeline was a real bottleneck (SURVEY.md
§3.1). Here a background thread drains the host sampler and stages batches
onto the device (optionally with a sharding) so the train step's inputs are
already in HBM when the previous step finishes.
"""

from __future__ import annotations

import queue
import threading

import jax


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator; yields device-resident pytrees.

    ``size`` is the staging depth (2 = classic double buffering).
    ``sharding`` (e.g. parallel.batch_sharding(mesh)) places each array
    directly into its distributed layout.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def place(a):
        if sharding is None:
            return jax.device_put(a)
        sh = sharding
        spec = getattr(sh, "spec", None)
        if spec is not None and a.ndim < len(spec):
            # rank-adapt: e.g. batch sharding P('data', None, None) applied
            # to a 1-D index vector -> P('data')
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(sh.mesh, P(*list(spec)[: a.ndim]))
        return jax.device_put(a, sh)

    def worker():
        try:
            for batch in iterator:
                q.put(jax.tree.map(place, batch))
        except BaseException as e:  # surface sampler/placement errors
            q.put(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
