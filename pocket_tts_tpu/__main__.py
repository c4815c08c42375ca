from pocket_tts_tpu.api.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
