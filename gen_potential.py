#!/usr/bin/env python
"""Example script-potential generator (symmetric Pöschl-Teller).

Reads the JSON grid description the solver writes to stdin and prints one
potential value per line in x-major (i, j, k) order — the same contract as
the reference's gen_potential.py (reference: gen_potential.py:8-28,63-66).
The 1D Pöschl-Teller well V(x) = −λ(λ+1)/2 · sech²(x) is analytically
solvable (E_n = −(λ−n)²/2), making this a physics oracle for the
FromScript path.
"""

import json
import sys

import numpy as np

data = json.load(sys.stdin)

lam = 6  # well depth parameter, user-settable

gx, gy, gz = data["grid"]["x"], data["grid"]["y"], data["grid"]["z"]
dn = data["grid"]["dn"]

extent_x = (dn * gx - dn) / 2
extent_y = (dn * gy - dn) / 2
extent_z = (dn * gz - dn) / 2

sx = np.linspace(-extent_x, extent_x, gx)
sy = np.linspace(-extent_y, extent_y, gy)
sz = np.linspace(-extent_z, extent_z, gz)
x, y, z = np.meshgrid(sx, sy, sz, indexing="ij")

coeff = -(lam * (lam + 1)) / 2
sech2 = lambda n: 1.0 / np.cosh(n) ** 2  # noqa: E731
V = coeff * sech2(x) + coeff * sech2(y) + coeff * sech2(z)

out = sys.stdout
for v in V.reshape(-1):
    out.write(f"{v}\n")
