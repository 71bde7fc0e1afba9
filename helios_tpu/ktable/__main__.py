"""ktable CLI: `python -m helios_tpu.ktable` (reference ktable/ktable.py).

Two stages: "building" per-species tables from HELIOS-K output (a species
file lists name + directory per row), then "mixing" them into the premixed
table (a final-species file lists name, absorbing, scattering, and mixing
ratio per row).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="helios-tpu-ktable")
    ap.add_argument("-stage", choices=["building", "mixing", "both"],
                    default="both")
    ap.add_argument("-format", choices=["k-distribution", "sampling"],
                    default="k-distribution")
    ap.add_argument("-heliosk_format", choices=["binary", "text"],
                    default="binary")
    ap.add_argument("-individual_species_file", default=None,
                    help="rows: species_name heliosk_output_dir")
    ap.add_argument("-final_species_file", default=None,
                    help="rows: name absorbing scattering mixing_ratio")
    ap.add_argument("-individual_calc_path", default="./output_ktable/")
    ap.add_argument("-final_path", default="./output_ktable/final/")
    ap.add_argument("-fastchem_path", default=None)
    ap.add_argument("-grid_lower_limit", type=float, default=0.34)
    ap.add_argument("-grid_upper_limit", type=float, default=30.0)
    ap.add_argument("-resolution", type=float, default=50.0)
    ap.add_argument("-n_gauss", type=int, default=20)
    args = ap.parse_args(argv)

    from helios_tpu.ktable import build as kb
    from helios_tpu.ktable import combine as kc
    from helios_tpu.ktable import information

    if args.stage in ("building", "both"):
        if not args.individual_species_file:
            ap.error("-individual_species_file required for building")
        cfg = kb.BuildConfig(
            format=args.format, heliosk_format=args.heliosk_format,
            grid_limits=(args.grid_lower_limit, args.grid_upper_limit),
            resolution=args.resolution, n_gauss=args.n_gauss,
            output_dir=args.individual_calc_path)
        with open(args.individual_species_file) as f:
            next(f)
            for line in f:
                col = line.split()
                if col:
                    print(f"building {col[0]} from {col[1]}")
                    kb.build_species(cfg, col[0], col[1])

    if args.stage in ("mixing", "both"):
        if not args.final_species_file:
            ap.error("-final_species_file required for mixing")
        species = kc.parse_final_species_file(args.final_species_file)
        comb = kc.Combiner(individual_dir=args.individual_calc_path,
                           final_dir=args.final_path, format=args.format,
                           fastchem_dir=args.fastchem_path)
        comb.combine_all(species)
        information.write_info(args.final_path, args.format)
        print("--- Production of mixed opacity table successful! ---")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
