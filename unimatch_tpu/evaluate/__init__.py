"""Validation / submission harnesses (flow, stereo, depth)."""


def require_samples(ds, root):
    """Guard validators against a missing/empty dataset root.

    Without this, a dataset whose file globs matched nothing validates over
    zero samples and reports NaN means; callers (e.g. the periodic-validation
    hook in the training loop) instead catch FileNotFoundError and skip.
    """
    if len(ds) == 0:
        raise FileNotFoundError(f"no samples found under {root!r}")
    return ds
