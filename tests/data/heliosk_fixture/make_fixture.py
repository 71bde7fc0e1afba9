"""One-time generator of the committed HELIOS-K product-format fixture.

HELIOS-K (github.com/exoclime/HELIOS-K) writes one opacity chunk per
(wavenumber range, temperature, pressure) as

    Out_<name>_<numin>_<numax>_<T>_<presscode>.bin

where every convention below is byte-exactly reproduced from how the
reference ktable program CONSUMES the files (the consumer defines the
contract; /root/reference/ktable/source_ktable/
build_individual_opacities.py):

* file name fields (lines 256-299): zero-padded 5-digit integer numin,
  numax [cm^-1] and temperature [K]; pressure as a sign-letter code
  ('n'/'p' + 100*|log10 P| zero-padded to 3) mapped through press_dict
  (lines 63-108); an OPTIONAL species/source tag between "Out" and
  numin that may itself contain underscores (parsed positionally from
  the END, lines 273-299);
* `.bin` payload (lines 380-384 via np.fromfile(..., np.float32)): a
  raw little-endian float32 stream of opacity values [cm^2 g^-1] on
  the ascending wavenumber grid numin..numax, NO header, NO wavenumber
  column -- the grid spacing is implied by len(data)/(numax-numin);
* `.dat` payload (lines 387-397): whitespace-separated text, wavenumber
  in column 0 and opacity in column 1;
* files containing "_cbin" are HELIOS-K's pre-binned variant and MUST
  be ignored by the scanner (line 246).

The spectra themselves are synthetic but physically shaped: a
wavenumber^-2 continuum plus pressure-broadened Lorentzian lines with
T-dependent strengths, values spanning ~1e-6..1e2 cm^2 g^-1 like a real
H2O chunk.  Deterministic (fixed seed) so the committed bytes are
stable; re-running this script must reproduce them bit-for-bit.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

NAME = "01_HITEMP_H2O"        # species tag WITH underscores (parser edge)
CHUNKS = [(1000, 2000), (2000, 3000)]   # [cm^-1], 1 cm^-1 spacing
TEMPS = [300, 600]                       # K
PRESS = ["n200", "p000"]                 # 1e-2 and 1e0 (reference press_dict)
PRESS_VAL = {"n200": 1e-2, "p000": 1e0}


def spectrum(nu, T, P):
    """Continuum + Lorentzian lines, deterministic per (T, P)."""
    rng = np.random.default_rng(42)      # line list shared by all files
    centers = rng.uniform(1000.0, 3000.0, 60)
    strengths = 10.0 ** rng.uniform(-1.0, 2.5, 60)
    e_low = rng.uniform(0.0, 2000.0, 60)   # lower-state energy [cm^-1]

    k = 1e-6 * (nu / 1000.0) ** -2.0       # continuum
    gamma = 0.05 + 0.5 * (P / 1.0) * (296.0 / T) ** 0.5   # HWHM [cm^-1]
    c2 = 1.4388                             # hc/kB [cm K]
    for c, s, e in zip(centers, strengths, e_low):
        boltz = np.exp(-c2 * e / T) / np.exp(-c2 * e / 296.0)
        k = k + s * boltz * (gamma / np.pi) / ((nu - c) ** 2 + gamma ** 2)
    return k.astype(np.float32)


def main():
    for (n0, n1) in CHUNKS:
        nu = np.arange(n0, n1, 1.0)
        for T in TEMPS:
            for pc in PRESS:
                k = spectrum(nu, float(T), PRESS_VAL[pc])
                base = f"Out_{NAME}_{n0:05d}_{n1:05d}_{T:05d}_{pc}"
                k.tofile(os.path.join(HERE, base + ".bin"))
                # one .dat twin (text format path) for the first cell
                if (n0, T, pc) == (CHUNKS[0][0], TEMPS[0], PRESS[0]):
                    with open(os.path.join(HERE, "dat", base + ".dat"),
                              "w") as f:
                        for x, y in zip(nu, k):
                            f.write(f"{x:.1f} {y:.6e}\n")
    # a pre-binned decoy the scanner must skip (consumer line 246)
    np.zeros(16, np.float32).tofile(os.path.join(
        HERE, f"Out_{NAME}_01000_02000_00300_n200_cbin.bin"))


if __name__ == "__main__":
    os.makedirs(os.path.join(HERE, "dat"), exist_ok=True)
    main()
    print("fixture written to", HERE)
