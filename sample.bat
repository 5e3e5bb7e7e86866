@echo off
rem Windows sampling launcher (reference surface parity: sample.bat).
python sample.py --model DiT-L --ckpt ..\1880000.pt %*
