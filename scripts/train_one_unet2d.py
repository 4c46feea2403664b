import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from run_all import train_one, ensure_data
from blindno.suites.registry import SUITES
spec = SUITES["fpe2d"]
ensure_data(spec)
train_one(spec, "unet")
