from saber_tpu.main import routines

if __name__ == "__main__":
    routines()
