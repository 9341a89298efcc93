SELECT * FROM (VALUES
(CAST('verify' AS VARCHAR),CAST('triples' AS VARCHAR),CAST(0 AS INTEGER),CAST(30 AS BIGINT),CAST(96 AS BIGINT),CAST('doc108' AS VARCHAR),CAST('doc54' AS VARCHAR),CAST(0 AS BIGINT),CAST(TRUE AS BOOLEAN),CAST('ok' AS VARCHAR)),
('verify','triples',1,22,70,'doc101','doc77',0,TRUE,'ok'),
('verify','triples',2,30,84,'doc106','doc64',0,TRUE,'ok'),
('verify','triples',3,39,133,'doc109','doc80',0,TRUE,'ok'),
('verify','triples',4,25,79,'doc113','doc93',0,TRUE,'ok'),
('verify','triples',5,26,81,'doc100','doc86',0,TRUE,'ok'),
('verify','triples',6,33,107,'doc116','doc82',0,TRUE,'ok'),
('verify','triples',7,35,117,'doc148','doc99',0,TRUE,'ok'),
('verify','triples',8,33,95,'doc124','doc9',0,TRUE,'ok'),
('verify','triples',9,37,96,'doc104','doc98',0,TRUE,'ok'),
('verify','triples',10,24,75,'doc1','doc97',0,TRUE,'ok'),
('verify','triples',11,22,71,'doc0','doc55',0,TRUE,'ok'),
('verify','triples',12,34,99,'doc105','doc96',0,TRUE,'ok'),
('verify','triples',13,29,86,'doc119','doc94',0,TRUE,'ok'),
('verify','triples',14,30,99,'doc138','doc90',0,TRUE,'ok'),
('verify','triples',15,37,114,'doc10','doc95',0,TRUE,'ok')
) AS t("run_id","stage","partition_id","doc_count","triple_count","min_doc","max_doc","wall_ms","spans_sig_ok","status")