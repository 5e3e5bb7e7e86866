@echo off
rem Windows training launcher (reference surface parity: train.bat).
rem No torchrun needed: the JAX trainer is single-controller and uses every
rem local device automatically; --dist is accepted as a documented no-op.
python train.py --data-path "../ORS13402_no_audio" --model DiT-L --num-workers 1 --epochs 100 --global-batch-size 32 --ckpt-every 20000 --seq-len 128 %*
