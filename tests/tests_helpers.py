"""Small shared numpy helpers for tests."""
import numpy as np

import ref_numpy


def momenta_np(theta, pos, gamma):
    """Momentum vectors for a batch of (theta, pos) in the vert medium."""
    nag = ref_numpy.make_medium("vert_heterogeneous")
    out = np.zeros((len(theta), 2))
    for k in range(len(theta)):
        n, _ = nag(pos[k, 0], pos[k, 1])
        u = np.array([np.cos(theta[k]), np.sin(theta[k])])
        out[k] = ref_numpy.moments(theta[k], n, u, gamma)
    return out
