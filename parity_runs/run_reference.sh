#!/bin/bash
# Reference-simulator parity runs (round 2). Single CPU core -- sequential.
# modes 2/3 MUST use threads=1: the reference re-creates its Park-Miller LCG
# per worker process, so threads>1 replays identical noise in every block.
M="/root/reference/Channel_Codes_Database/Wimax LDPC Codes/wimax_576_0.5.alist.txt"
R=/root/reference/python_ldpc_app/main.py
OUT=/root/repo/parity_runs
cd /root/reference

# mode 2 (partial-band interference): BER parity at FER~1 points
nice -n 19 python $R --matrix "$M" --blocks 150 --iterations 5 --ber --fer \
  --mode 2 --p 0.05 --interference-snr 10 --initial-snr 2 --end-snr 10 --step-snr 4 \
  --threads 1 --output-json $OUT/ref_mode2.json > $OUT/ref_mode2.log 2>&1

# mode 3 (barrage jamming): FER transition points
nice -n 19 python $R --matrix "$M" --blocks 200 --iterations 5 --ber --fer \
  --mode 3 --p 0.1 --interference-snr 6 --initial-snr 7 --end-snr 9 --step-snr 2 \
  --threads 1 --output-json $OUT/ref_mode3.json > $OUT/ref_mode3.log 2>&1

# QPSK proxy (modulation 2), mode 1 legacy noise
nice -n 19 python $R --matrix "$M" --blocks 200 --iterations 5 --ber --fer \
  --mode 1 --modulation 2 --initial-snr 3 --end-snr 5 --step-snr 1 \
  --threads 1 --output-json $OUT/ref_qpsk.json > $OUT/ref_qpsk.log 2>&1

# deep waterfall, mode 1 BPSK legacy: FER ~ low 1e-3 at 3.5 dB
nice -n 19 python $R --matrix "$M" --blocks 4000 --iterations 5 --ber --fer \
  --mode 1 --initial-snr 3.5 --end-snr 3.5 --step-snr 1 \
  --threads 1 --output-json $OUT/ref_deep.json > $OUT/ref_deep.log 2>&1
echo DONE > $OUT/ref_chain.done
