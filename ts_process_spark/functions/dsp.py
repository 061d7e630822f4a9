"""Pure-NumPy signal kernels re-expressing the ts-process capability
surface (scipy is not available in this environment, so filter design is
implemented from the published closed forms).

Reference semantics (cited, re-derived — not copied):
- integrate / derivative        /root/reference/ts_process/ts_library.py:96-124
- smooth (in-place 3-pt IIR)    ts_library.py:393-409
- taper (Kaiser β=14 windows)   ts_library.py:439-479
- zero-pad rule 1.5·N/fmin      ts_library.py:805-818
- Butterworth → SOS → filtfilt  ts_library.py:835-894
- polimod / baseline_function   ts_library.py:575-684
- rotate pair (90°/270° matrix) ts_library.py:686-777
- FAS                           ts_library.py:411-437
- interp: decimate / sinc       ts_library.py:896-962
- SDOF oscillator recurrence    rotd50/calcrsp.f:102-170 (Nigam–Jennings
  exact-piecewise coefficients, a published method)
- RotD50 (90 angles → 180 Sa → median), amplitude pre-filter, Famp1.5
                                 rotd50/rotd50.f:185-246

All kernels are float64 and deterministic; they run inside grouped-map
Arrow UDFs (see operators/analytics.py), parallel across groups,
sequential within — the reference's single-series semantics preserved
per group.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ calculus


def integrate(data: np.ndarray, dt: float) -> np.ndarray:
    """Cumulative trapezoid with the reference's data[0]·dt/2 offset
    (ts_library.py:96-109)."""
    data = np.asarray(data, dtype=np.float64)
    out = np.empty_like(data)
    out[0] = 0.0
    if len(data) > 1:
        np.cumsum((data[1:] + data[:-1]) * (dt / 2.0), out=out[1:])
    return out + data[0] * dt / 2.0


def derivative(data: np.ndarray, dt: float) -> np.ndarray:
    """First difference with 0 prepended (ts_library.py:111-124)."""
    data = np.asarray(data, dtype=np.float64)
    return np.diff(np.insert(data, 0, 0.0)) / dt


def smooth(data: np.ndarray, factor: int = 3) -> np.ndarray:
    """The reference's *in-place sequential* smoother: each point mixes
    the already-smoothed left neighbor (ts_library.py:393-409) — an
    IIR-like recurrence, deliberately not a plain FIR average."""
    data = np.array(data, dtype=np.float64, copy=True)
    c = 0.5 / (factor - 1)
    for i in range(1, data.size - 1):
        data[i] = 0.5 * data[i] + c * data[i - 1] + c * data[i + 1]
    return data


# ------------------------------------------------------------- windows


def taper_window(flag: str, m: int, samples: int) -> np.ndarray:
    """Kaiser(β=14) taper at front/end/both (ts_library.py:439-479),
    including its off-by-one append repair."""
    window = np.kaiser(2 * m + 1, 14.0)
    if flag == "front":
        window = np.concatenate([window[: m + 1], np.ones(samples - m - 1)])
    elif flag == "end":
        window = np.concatenate([np.ones(samples - m - 1), window[m + 1 :]])
    elif flag == "all":
        window = np.concatenate(
            [window[: m + 1], np.ones(samples - 2 * m - 1), window[m + 1 :]]
        )
    if window.size < samples:
        window = np.append(window, 1.0)
    if window.size != samples:
        return np.ones(samples)
    return window


def tukey(n: int, alpha: float = 0.5) -> np.ndarray:
    """Tukey (tapered cosine) window — the post-resample taper
    (ts_library.py:1028-1035)."""
    if alpha <= 0:
        return np.ones(n)
    if alpha >= 1:
        return np.hanning(n)
    x = np.linspace(0, 1, n)
    w = np.ones(n)
    left = x < alpha / 2
    right = x >= 1 - alpha / 2
    w[left] = 0.5 * (1 + np.cos(2 * np.pi / alpha * (x[left] - alpha / 2)))
    w[right] = 0.5 * (1 + np.cos(2 * np.pi / alpha * (x[right] - 1 + alpha / 2)))
    return w


def pad_for_highpass(
    data: np.ndarray, dt: float, fmin: float, order: int = 4, existing: int = 0
) -> tuple[np.ndarray, int]:
    """Zero-pad both ends before high/band-pass: total pad 1.5·N/fmin
    seconds, half per side (ts_library.py:805-818)."""
    tz_pad = (1.5 * order / fmin) / dt
    pad_length = int(np.round(tz_pad / 2.0))
    if existing >= pad_length:
        return np.asarray(data, dtype=np.float64), existing
    z = np.zeros(pad_length - existing)
    return np.concatenate([z, data, z]), pad_length


# ------------------------------------------- IIR design (pure NumPy)


def _butter_zpk(N: int, Wn, btype: str):
    """Butterworth digital design via analog prototype + bilinear
    transform (standard textbook derivation; scipy-compatible Wn in
    units of Nyquist)."""
    # analog lowpass prototype: poles on the unit circle's left half
    k = np.arange(1, N + 1)
    p = np.exp(1j * np.pi * (2 * k + N - 1) / (2 * N))
    z = np.array([], dtype=complex)
    gain = 1.0
    fs = 2.0
    warped = (
        2 * fs * np.tan(np.pi * np.asarray(Wn, dtype=np.float64) / fs)
        if np.ndim(Wn)
        else 2 * fs * np.tan(np.pi * float(Wn) / fs)
    )
    if btype == "lowpass":
        w0 = float(warped)
        p = p * w0
        gain *= w0**N
    elif btype == "highpass":
        w0 = float(warped)
        p = w0 / p
        z = np.zeros(N, dtype=complex)
        gain *= 1.0  # prod(-p_proto)=±1; |prod| = 1 for Butterworth
        # exact: k * real(prod(-z)/prod(-p)) of the prototype == 1
    elif btype == "bandpass":
        w1, w2 = (float(warped[0]), float(warped[1]))
        bw = w2 - w1
        wo = np.sqrt(w1 * w2)
        p_lp = p * bw / 2
        disc = np.sqrt(p_lp**2 - wo**2 + 0j)
        p = np.concatenate([p_lp + disc, p_lp - disc])
        z = np.zeros(N, dtype=complex)
        gain *= bw**N
    else:
        raise ValueError(btype)
    # bilinear transform z = (1 + s/(2fs)) / (1 - s/(2fs))
    fs2 = 2.0 * fs
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    # zeros at infinity map to z = -1
    deg = len(p) - len(z)
    z_d = np.concatenate([z_d, -np.ones(deg)])
    gain_d = gain * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return z_d, p_d, gain_d


def _poly_from_roots(roots: np.ndarray) -> np.ndarray:
    return np.real_if_close(np.poly(roots)) if len(roots) else np.array([1.0])


def zpk2sos(z: np.ndarray, p: np.ndarray, k: float) -> np.ndarray:
    """Pair conjugate poles/zeros into biquads (sufficient pairing for
    Butterworth-type filters whose zeros are all at z=±1)."""

    def _sorted_conj_pairs(roots: np.ndarray) -> list[np.ndarray]:
        cplx = sorted(
            (r for r in roots if abs(r.imag) > 1e-12 and r.imag > 0),
            key=lambda r: -abs(abs(r) - 1),
        )
        real = sorted((r for r in roots if abs(r.imag) <= 1e-12), key=lambda r: r.real)
        pairs = [np.array([r, np.conj(r)]) for r in cplx]
        for i in range(0, len(real) - 1, 2):
            pairs.append(np.array([real[i], real[i + 1]]))
        if len(real) % 2:
            pairs.append(np.array([real[-1]]))
        return pairs

    zp = _sorted_conj_pairs(z)
    pp = _sorted_conj_pairs(p)
    n_sections = max(len(zp), len(pp))
    while len(zp) < n_sections:
        zp.append(np.array([]))
    while len(pp) < n_sections:
        pp.append(np.array([]))
    sos = np.zeros((n_sections, 6))
    for i in range(n_sections):
        b = _poly_from_roots(zp[i])
        a = _poly_from_roots(pp[i])
        b = np.pad(np.atleast_1d(np.real(b)), (0, 3 - len(np.atleast_1d(b))))
        a = np.pad(np.atleast_1d(np.real(a)), (0, 3 - len(np.atleast_1d(a))))
        sos[i, :3] = b
        sos[i, 3:] = a
    sos[0, :3] *= k
    return sos


def butter_sos(N: int, Wn, btype: str = "lowpass") -> np.ndarray:
    """Digital Butterworth in SOS form; Wn normalized by Nyquist (the
    reference's zpk2sos(butter(...)) path, ts_library.py:883-889)."""
    z, p, k = _butter_zpk(N, Wn, btype)
    return zpk2sos(z, p, k)


def cheby1_sos(N: int, rp: float, Wn, btype: str = "lowpass") -> np.ndarray:
    """Chebyshev-I digital design (closed-form poles) — the anti-alias
    filter family scipy's decimate() uses (order 8, rp=0.05, cutoff
    0.8/q), which is the reference's downsample fast path
    (ts_library.py:919-925)."""
    if btype != "lowpass":
        raise NotImplementedError("cheby1 used only for the decimate lowpass")
    eps = np.sqrt(10 ** (0.1 * rp) - 1.0)
    mu = np.arcsinh(1.0 / eps) / N
    m = np.arange(1, N + 1)
    theta = np.pi * (2 * m - 1) / (2 * N)
    p = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    # analog prototype gain: |H(0)| = 1 (odd N) or 1/sqrt(1+eps²) (even)
    k = np.real(np.prod(-p))
    if N % 2 == 0:
        k /= np.sqrt(1.0 + eps**2)
    fs = 2.0
    warped = 2 * fs * np.tan(np.pi * float(Wn) / fs)
    p = p * warped
    k *= warped**N
    fs2 = 2.0 * fs
    p_d = (fs2 + p) / (fs2 - p)
    z_d = -np.ones(N)
    k_d = k * np.real(1.0 / np.prod(fs2 - p))
    return zpk2sos(z_d, p_d, k_d)


def sosfilt(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None):
    """Cascaded biquads, direct form II transposed.  Sequential by
    nature; loop is over samples with O(sections) state."""
    x = np.asarray(x, dtype=np.float64)
    n_sections = sos.shape[0]
    z = np.zeros((n_sections, 2)) if zi is None else zi.copy()
    y = np.empty_like(x)
    for n in range(len(x)):
        xn = x[n]
        for s in range(n_sections):
            b0, b1, b2, a0, a1, a2 = sos[s]
            w = xn
            xn = b0 * w + z[s, 0]
            z[s, 0] = b1 * w - a1 * xn + z[s, 1]
            z[s, 1] = b2 * w - a2 * xn
        y[n] = xn
    return y, z


def _sos_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state step response state per section (lfilter_zi
    equivalent), for transient-free filtfilt."""
    n_sections = sos.shape[0]
    zi = np.zeros((n_sections, 2))
    scale = 1.0
    for s in range(n_sections):
        b = sos[s, :3]
        a = sos[s, 3:]
        # solve (I - A) zi = B for direct form II transposed
        A = np.array([[-a[1], 1.0], [-a[2], 0.0]])
        B = np.array([b[1] - a[1] * b[0], b[2] - a[2] * b[0]])
        zi[s] = np.linalg.solve(np.eye(2) - A, B) * scale
        scale *= np.sum(b) / np.sum(a)
    return zi


def sosfiltfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering with odd-extension padding
    and steady-state initial conditions (scipy semantics re-derived;
    ts_library.py:889 uses scipy's sosfiltfilt)."""
    x = np.asarray(x, dtype=np.float64)
    ntaps = 2 * sos.shape[0] + 1
    padlen = min(3 * ntaps, len(x) - 1)
    if padlen > 0:
        ext = np.concatenate(
            [2 * x[0] - x[padlen:0:-1], x, 2 * x[-1] - x[-2 : -padlen - 2 : -1]]
        )
    else:
        ext = x
    zi = _sos_zi(sos)
    y, _ = sosfilt(sos, ext, zi * ext[0])
    y, _ = sosfilt(sos, y[::-1], zi * y[-1])
    y = y[::-1]
    return y[padlen : len(y) - padlen] if padlen > 0 else y


def filter_data(
    data: np.ndarray,
    dt: float,
    btype: str,
    fmin: float = 0.0,
    fmax: float = 0.0,
    N: int = 4,
) -> np.ndarray:
    """Butterworth filtfilt with the reference's Nyquist normalization
    (ts_library.py:856-889)."""
    nyq = (1.0 / dt) / 2.0
    if btype == "bandpass":
        Wn = [fmin / nyq, fmax / nyq]
    elif btype == "lowpass":
        Wn = fmax / nyq
    elif btype == "highpass":
        Wn = fmin / nyq
    else:
        raise ValueError(btype)
    return sosfiltfilt(butter_sos(N, Wn, btype), data)


# ---------------------------------------------------------- resampling


def interp_linear(data: np.ndarray, old_dt: float, new_dt: float) -> np.ndarray:
    """Linear resample to the new grid over the same duration (the
    linear InterpTime kernel, rotd50.f:284-305; also the engine's
    gap-fill rule)."""
    n = len(data)
    old_t = np.arange(n) * old_dt
    new_t = np.arange(0, n * old_dt, new_dt)
    new_t = new_t[new_t <= old_t[-1] + 1e-12]
    return np.interp(new_t, old_t, data)


def sinc_interp(data: np.ndarray, old_dt: float, new_dt: float) -> np.ndarray:
    """Whittaker–Shannon dense-matrix interpolation — the reference's
    non-integer resample path (ts_library.py:927-935).  O(n_old·n_new)
    memory: only for fixture-sized series, exactly like the original."""
    samples = len(data)
    old_times = np.arange(0, samples * old_dt, old_dt)
    if old_times.size == samples + 1:
        old_times = old_times[:-1]
    new_times = np.arange(0, samples * old_dt, new_dt)
    sinc_matrix = np.tile(new_times, (len(old_times), 1)) - np.tile(
        old_times[:, np.newaxis], (1, len(new_times))
    )
    return np.dot(data, np.sinc(sinc_matrix / old_dt))


def decimate(data: np.ndarray, q: int) -> np.ndarray:
    """Integer-factor downsample with zero-phase Chebyshev-I(8, 0.05,
    0.8/q) anti-aliasing — scipy.signal.decimate's default, the
    reference's fast path (ts_library.py:919-925)."""
    sos = cheby1_sos(8, 0.05, 0.8 / q)
    filtered = sosfiltfilt(sos, data)
    return filtered[::q]


def resample(data: np.ndarray, old_dt: float, new_dt: float) -> np.ndarray:
    """The reference's `interp` dispatch (ts_library.py:896-962):
    no-op / decimate / sinc."""
    if old_dt == new_dt:
        return np.asarray(data, dtype=np.float64)
    if new_dt % old_dt == 0.0:
        return decimate(data, int(new_dt // old_dt))
    return sinc_interp(data, old_dt, new_dt)


def pad_zeros_with_taper(x: np.ndarray, num: int, flag: str, m: int) -> np.ndarray:
    """seism_appendzeros (ts_library.py:481-525): Kaiser-taper the
    existing edge FIRST, then append ``num`` zeros at ``flag`` end."""
    x = np.asarray(x, dtype=np.float64)
    if num <= 0:
        return x
    if m != 0:
        x = x * taper_window(flag, m, len(x))
    zeros = np.zeros(num)
    return np.append(zeros, x) if flag == "front" else np.append(x, zeros)


def cut_with_taper(x: np.ndarray, num: int, flag: str, m: int) -> np.ndarray:
    """seism_cutting (ts_library.py:527-573): drop ``num`` samples from
    ``flag`` end, then Kaiser-taper the new edge.  No-op (like the
    reference's error path) if the cut would consume the series."""
    x = np.asarray(x, dtype=np.float64)
    if num <= 0 or num >= len(x):
        return x
    x = x[num:] if flag == "front" else x[:-num]
    return x * taper_window(flag, m, len(x))


def spline_second_derivs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Natural cubic spline second derivatives (the reference's
    InterpSpline setup, rotd50/spline.f:1-34, natural-boundary branch
    y2[0]=y2[n-1]=0).  Thomas-algorithm sweep — sequential recurrence by
    nature (like `smooth`); a fixture-parity kernel, not the hot path."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        u[i] = (
            6.0
            * (
                (y[i + 1] - y[i]) / (x[i + 1] - x[i])
                - (y[i] - y[i - 1]) / (x[i] - x[i - 1])
            )
            / (x[i + 1] - x[i - 1])
            - sig * u[i - 1]
        ) / p
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    return y2


def spline_interp(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Evaluate the natural cubic spline at query points (vectorized
    splint, rotd50/splint.f:1-25: bisection bracket + cubic blend)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xq = np.asarray(xq, dtype=np.float64)
    y2 = spline_second_derivs(x, y)
    hi = np.clip(np.searchsorted(x, xq), 1, len(x) - 1)
    lo = hi - 1
    h = x[hi] - x[lo]
    a = (x[hi] - xq) / h
    b = (xq - x[lo]) / h
    return a * y[lo] + b * y[hi] + (
        (a**3 - a) * y2[lo] + (b**3 - b) * y2[hi]
    ) * (h**2) / 6.0


def interp_fft(data: np.ndarray, factor: int) -> np.ndarray:
    """Band-limited upsample by an integer factor via spectrum zero-pad
    (the reference's InterpFreq, rotd50/ft_th.f:32-57: halve the Nyquist
    bin, conjugate-symmetric fill, inverse FFT) — expressed with rfft /
    irfft, which implements exactly that symmetry."""
    data = np.asarray(data, dtype=np.float64)
    n = len(data)
    spec = np.fft.rfft(data)
    if n % 2 == 0:
        spec[-1] *= 0.5  # split the Nyquist bin across ±f_nyq
    out = np.fft.irfft(spec, n=n * factor) * factor
    return out


# ------------------------------------------------------------ baseline


def polimod(x: np.ndarray, y: np.ndarray, n: int, m: int) -> np.ndarray:
    """Least-squares polynomial fit with the first m terms dropped
    (ts_library.py:575-617): columns x^(m+1) … x^n, normal equations."""
    G = np.column_stack([x ** (j + 1 + m) for j in range(n - m)])
    GT = G.T
    return np.linalg.solve(GT @ G, GT @ y)


def baseline_correction(
    acc: np.ndarray, dt: float, gscale: float = 1.0, order: int = 5
):
    """Integrate acc→vel→dis (sequential trapezoid with half-step
    seeds), fit order-n polynomial to displacement without constant and
    linear terms, subtract the analytic poly/derivatives
    (ts_library.py:619-684).  Returns (times, amod, vmod, dmod)."""
    if order not in (3, 5, 10):
        raise ValueError("baseline order must be 3, 5, or 10")
    acc = np.asarray(acc, dtype=np.float64) * gscale
    times = np.linspace(0, (len(acc) - 1) * dt, len(acc))
    vel = integrate(acc, dt)
    dis = integrate(vel, dt)
    p = polimod(times, dis, order, 1)
    # p = [c2, c3, ..., c_order] (ascending powers starting at x^2)
    powers = np.arange(2, order + 1)
    dcor = sum(c * times**k for c, k in zip(p, powers))
    vcor = sum(c * k * times ** (k - 1) for c, k in zip(p, powers))
    acor = sum(c * k * (k - 1) * times ** (k - 2) for c, k in zip(p, powers))
    return times, (acc - acor) / gscale, vel - vcor, dis - dcor


# ------------------------------------------------------------- rotation


def rotate_pair(
    h1: np.ndarray,
    h2: np.ndarray,
    rotation_angle: float,
    angle_between: float = 90.0,
):
    """2×2 rotation of an orthogonal horizontal pair
    (ts_library.py:686-777); angle_between ∈ {90, 270}."""
    rad = np.radians(rotation_angle)
    if abs(angle_between) == 90:
        m = np.array(
            [[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]]
        )
    elif abs(angle_between) == 270:
        m = np.array(
            [[np.cos(rad), np.sin(rad)], [np.sin(rad), -np.cos(rad)]]
        )
    else:
        raise ValueError("channels must be orthogonal (90 or 270 apart)")
    n = min(len(h1), len(h2))
    out = m @ np.vstack([h1[:n], h2[:n]])
    return out[0], out[1]


# ------------------------------------------------------------------ FAS


def fas(data: np.ndarray, dt: float, points: int, fmin: float, fmax: float,
        s_factor: int = 3):
    """Fourier amplitude spectrum with frequency slice + smoothing
    (ts_library.py:411-437)."""
    afs = np.abs(np.fft.fft(data, points)) * dt
    freq = (1.0 / dt) * np.arange(points) / points
    deltaf = (1.0 / dt) / points
    inif = int(fmin / deltaf)
    endf = int(fmax / deltaf) + 1
    return freq[inif:endf], smooth(afs[inif:endf], s_factor)


def get_points(samples: int) -> int:
    """Next power of two above samples (ts_library.py:380-391)."""
    return 2 ** (int(np.log2(samples)) + 1)


# ----------------------------------------- response spectrum / RotD50


def oscillator_coeffs(w: float, beta: float, dt: float):
    """Nigam–Jennings exact-piecewise SDOF coefficients
    (calcrsp.f:102-135; published method: Nigam & Jennings, BSSA 1969)."""
    t1 = np.sqrt(1.0 - beta**2)
    t2 = np.sin(w * t1 * dt)
    t3 = np.cos(w * t1 * dt)
    t4 = np.exp(-beta * w * dt)
    s1 = (2.0 * beta**2 - 1.0) / (w**2 * dt)
    s2 = 2.0 * beta / (w**3 * dt)
    a11 = t4 * (beta * t2 / t1 + t3)
    a12 = t4 * t2 / (w * t1)
    a21 = -t4 * w * t2 / t1
    a22 = t4 * (t3 - beta * t2 / t1)
    b11 = t4 * ((s1 + beta / w) * t2 / (w * t1) + (s2 + 1.0 / w**2) * t3) - s2
    b12 = -t4 * (s1 * t2 / (w * t1) + s2 * t3) - 1.0 / w**2 + s2
    b21 = (s1 + beta / w) * (t3 - beta * t2 / t1)
    b21 = t4 * (b21 - (s2 + 1.0 / w**2) * (w * t1 * t2 + beta * w * t3)) + 1.0 / (
        w**2 * dt
    )
    b22 = s1 * (t3 - beta * t2 / t1)
    b22 = -t4 * (b22 - s2 * (w * t1 * t2 + beta * w * t3)) - 1.0 / (w**2 * dt)
    return (a11, a12, a21, a22), (b11, b12, b21, b22)


def oscillator_response(x: np.ndarray, w: float, beta: float, dt: float) -> np.ndarray:
    """Pseudo-acceleration response history: rsp[i] = d[i]·w²
    (calcrsp.f:138-170)."""
    (a11, a12, a21, a22), (b11, b12, b21, b22) = oscillator_coeffs(w, beta, dt)
    t2 = w**2
    d = v = a_prev = 0.0
    out = np.empty(len(x), dtype=np.float64)
    for i, ap1 in enumerate(np.asarray(x, dtype=np.float64)):
        dp1 = a11 * d + a12 * v + b11 * a_prev + b12 * ap1
        vp1 = a21 * d + a22 * v + b21 * a_prev + b22 * ap1
        out[i] = dp1 * t2
        a_prev, v, d = ap1, vp1, dp1
    return out


def calc_sa(x: np.ndarray) -> float:
    """Peak = max |x| (rotd50.f:272-281)."""
    return float(np.max(np.abs(x))) if len(x) else 0.0


ROTD50_PERIODS = np.array(
    [0.01, 0.02, 0.03, 0.05, 0.075, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5,
     0.75, 1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 7.5, 10.0]
)  # a practical subset of the fixed 63-period grid (rotd50.f:36-45)

ROTD50_PERIODS_FULL = np.array(
    [0.010, 0.011, 0.012, 0.013, 0.015, 0.017, 0.020, 0.022, 0.025, 0.029,
     0.032, 0.035, 0.040, 0.045, 0.050, 0.055, 0.060, 0.065, 0.075, 0.085,
     0.100, 0.110, 0.120, 0.130, 0.150, 0.170, 0.200, 0.220, 0.240, 0.260,
     0.280, 0.300, 0.350, 0.400, 0.450, 0.500, 0.550, 0.600, 0.650, 0.750,
     0.850, 1.000, 1.100, 1.200, 1.300, 1.500, 1.700, 2.000, 2.200, 2.400,
     2.600, 2.800, 3.000, 3.500, 4.000, 4.400, 5.000, 5.500, 6.000, 6.500,
     7.500, 8.500, 10.000]
)  # the reference's EXACT 63-period response-spectrum domain
#    (rotd50.f:36-45, damping 0.05)


def rotd50(
    acc1: np.ndarray,
    acc2: np.ndarray,
    dt: float,
    periods: np.ndarray = ROTD50_PERIODS,
    damping: float = 0.05,
):
    """RotD50 per period: oscillator histories for both components,
    amplitude pre-filter at min(Sa)/1.5, 90 rotation angles → 180 Sa
    values, median = mean of sorted ranks 90/91 (rotd50.f:185-235).
    Returns (psa_1, psa_2, rotd50) arrays over `periods`."""
    n = min(len(acc1), len(acc2))
    acc1, acc2 = np.asarray(acc1[:n]), np.asarray(acc2[:n])
    psa1 = np.empty(len(periods))
    psa2 = np.empty(len(periods))
    rd50 = np.empty(len(periods))
    for ip, period in enumerate(periods):
        w = 2.0 * np.pi / period
        th1 = oscillator_response(acc1, w, damping, dt)
        th2 = oscillator_response(acc2, w, damping, dt)
        sa1, sa2 = calc_sa(th1), calc_sa(th2)
        test = min(sa1, sa2) / 1.5
        mask = np.maximum(np.abs(th1), np.abs(th2)) > test
        r1, r2 = th1[mask], th2[mask]
        angles = np.radians(np.arange(90) * (3.14159 / np.pi))  # Fortran's π
        cosr, sinr = np.cos(angles), np.sin(angles)
        # 90×n rotations in one matmul (the Fortran loop vectorized)
        xs = np.outer(cosr, r1) - np.outer(sinr, r2)
        ys = np.outer(sinr, r1) + np.outer(cosr, r2)
        sa = np.concatenate(
            [np.max(np.abs(xs), axis=1), np.max(np.abs(ys), axis=1)]
        )
        psa1[ip], psa2[ip] = sa[0], sa[90]
        sa.sort()
        rd50[ip] = (sa[89] + sa[90]) / 2.0  # Fortran Sa(90)+Sa(91), 1-based
    return psa1, psa2, rd50


def famp15(rd50_vals: np.ndarray, periods: np.ndarray) -> float | None:
    """First frequency where spectral shape ≥ 1.5 (rotd50.f:238-246;
    assumes periods ordered from the anchor onward)."""
    for i in range(1, len(periods)):
        if rd50_vals[i] / rd50_vals[0] >= 1.5:
            return 1.0 / periods[i]
    return None
