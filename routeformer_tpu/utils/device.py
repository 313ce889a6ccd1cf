"""Device placement helpers."""

import contextlib


@contextlib.contextmanager
def init_on_cpu():
    """Run module construction on the host CPU device.

    nnx initialization issues hundreds of small ops; on a tunnel-attached
    TPU each is a network round-trip (~5 min for the flagship model vs
    seconds on CPU). Params move to the accelerator in one transfer at the
    first jitted call (or explicitly via the mesh placement). No-op when no
    CPU device is registered.
    """
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None:
        yield
        return
    with jax.default_device(cpu):
        yield
