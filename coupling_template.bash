#!/usr/bin/env bash
# Chemistry-coupling outer loop for helios_tpu — the analogue of the
# reference's coupling_template.bash. Alternates helios_tpu (radiative-
# convective solve at fixed chemistry) with YOUR photochemical kinetics
# code (chemistry at fixed TP) until the TP profile stops changing.
#
# Per iteration i, helios_tpu
#   * reads the mixing-ratio file your chemistry code produced for step i,
#   * writes  output/${NAME}/${NAME}_tp_coupling_${i}.dat  (TP for chemistry),
#   * from i>=1, writes output/${NAME}/${NAME}_coupling_convergence.dat
#     ("1" once max |T_i - T_{i-1}|/T_i < convergence criterion).
# See docs/tutorial.md ("Chemistry coupling") for the file formats.

set -u

NAME=test
MIXFILE=vertical_mix

# run the iteration for a sufficient number of iterations (e.g., 10)
for i in $(seq 0 10); do
    # run helios_tpu first
    python3 -m helios_tpu -name "${NAME}" \
        -opacity_mixing on-the-fly \
        -file_with_vertical_mixing_ratios "../your_chemistry_code_dir/output/${MIXFILE}_${i}.txt" \
        -coupling_mode yes \
        -coupling_iteration_step "${i}"

    # stops iteration after convergence is found
    if (( i > 0 )); then
        STOP=$(<"output/${NAME}/${NAME}_coupling_convergence.dat")
        echo "--> Converged? ${STOP} (1 = yes, 0 = no)"
        if (( STOP == 1 )); then
            break
        fi
    fi

    # run here your photochemical kinetics code
    # --> read  output/${NAME}/${NAME}_tp_coupling_${i}.dat
    # --> and produce ${MIXFILE}_$((i+1)).txt so that it can be read in the
    #     next iteration step by helios_tpu
done
