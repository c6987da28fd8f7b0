"""State-space control loop: plant model -> pole placement ->
discretize -> closed-loop simulation on device.

End-to-end demo of the systems tier: build an unstable plant in
transfer-function form, convert to state space, place the closed-loop
poles with full-state feedback (Ackermann), discretize with zero-order
hold, and simulate the regulation transient with dlsim — whose
x[k+1] = A x[k] + B u[k] recurrence runs as a log-depth associative
scan on device. Then analyze the result: multitaper PSD of the control
effort and find_peaks on the transient envelope.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dsc_tpu as dsc
from dsc_tpu.models import (
    bode,
    cont2discrete,
    dlsim,
    find_peaks,
    lti,
    multitaper,
    place_poles,
    tf2ss,
)

dsc.init(int(2**30))

# --- the plant: an unstable second-order system plus an actuator lag ---
#     G(s) = 4 / ((s - 0.5)(s^2 + 0.4 s + 4))
num = [4.0]
den = np.polymul([1.0, -0.5], [1.0, 0.4, 4.0])
A, B, C, D = tf2ss(num, den)
print('open-loop poles:', np.round(np.linalg.eigvals(A), 3))

# --- full-state feedback: place the closed-loop poles ---
target = np.array([-2.0, -1.5 + 1.5j, -1.5 - 1.5j])
fsf = place_poles(A, B, target)
K = fsf.gain_matrix
print('placed poles:   ', np.round(np.sort_complex(fsf.computed_poles), 3))

# --- discretize the closed-loop system (zoh) and simulate on device ---
Acl = A - B @ K
dt = 0.02
ad, bd, cd, dd, _ = cont2discrete((Acl, B, C, D), dt)
steps = 4096
u = np.zeros((steps, 1), np.float32)       # regulation: zero input,
x0 = np.array([0.0, 0.0, 0.25])            # y(0) = C x0 = 1
t, y, x = dlsim((ad, bd, cd, dd, dt), dsc.from_numpy(u), x0=x0)
yn = y.numpy()[:, 0]
print(f'transient: |y[0]| = {abs(yn[0]):.3f} -> |y[-1]| = {abs(yn[-1]):.2e}')

# --- where does the transient ring? peaks of the decay envelope ---
peaks, props = find_peaks(np.abs(yn), height=1e-4, distance=10)
if peaks.size >= 2:
    ring_hz = 1.0 / (np.mean(np.diff(peaks[:6])) * dt) / 2.0
    print(f'ringing at ~{ring_hz:.2f} Hz '
          f'(placed imag part/(2 pi) = {1.5 / (2 * np.pi):.2f} Hz)')

# --- spectral check: multitaper PSD of the state trajectory ---
f, p = multitaper(dsc.from_numpy(x.numpy()[:, 0].astype(np.float32)),
                  fs=1.0 / dt, nw=3.0)
fr, pa = f.numpy(), p.numpy()
print(f'state PSD peak at {fr[np.argmax(pa[1:]) + 1]:.2f} Hz')

# --- and the classic frequency-domain view of the closed loop ---
w, mag, ph = bode((Acl, B, C, D), n=60)
print(f'closed-loop DC gain: {mag[0]:.1f} dB, '
      f'phase span {ph[0]:.0f} -> {ph[-1]:.0f} deg')
print('OK')
