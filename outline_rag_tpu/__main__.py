from outline_rag_tpu.main import main

main()
