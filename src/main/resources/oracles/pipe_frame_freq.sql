SELECT * FROM (VALUES
(CAST('Award' AS VARCHAR),CAST(232 AS BIGINT),CAST('receive' AS VARCHAR)),
('Being_born',127,'bear'),
('Parenting',112,'raise'),
('Marriage',116,'marry'),
('Work',975,'join'),
('Residence',126,'live'),
('Death',234,'die'),
('Education',202,'study'),
('Occupation',96,'work')
) AS t("frame","n_sentences","lus")