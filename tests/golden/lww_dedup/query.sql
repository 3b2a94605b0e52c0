-- last-writer-wins on (doc_id, lsn); same-lsn ties resolve op 'U' > 'D'
-- (engine semantics: operators/dedup_lww.py); deletes drop the key
SELECT doc_id, lsn, n_tok FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY lsn DESC, op DESC) AS rn
  FROM changes)
WHERE rn = 1 AND op <> 'D'
